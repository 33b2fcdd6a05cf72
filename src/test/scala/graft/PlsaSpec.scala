package graft

import org.apache.spark.sql.functions._

import graft.operators.Plsa

/** Fixed-point PLSA: separation on a separable corpus, bit-for-bit
  * layout invariance (the whole point of the integer EM), ppm
  * normalization invariants, and the deterministic argmax tie rule. */
class PlsaSpec extends SparkSuite {
  import spark.implicits._

  private def tokens(docs: Seq[(Long, String)]) =
    docs.toDF("d", "text")
      .select(col("d"), explode(split(col("text"), " ")).as("w"))
      .groupBy("d", "w").agg(count(lit(1)).as("c"))

  test("separable corpus: topics split the vocabularies; layout-invariant bit-for-bit") {
    val a = (0L until 10L).map(d => (d, "ball game team win score ball game"))
    val b = (10L until 20L).map(d => (d, "oven salt flour bake dough oven salt"))
    val tok = tokens(a ++ b)
    val m = Plsa.fit(tok, "d", "w", "c", k = 2, iters = 8)
    val topics = Plsa.docTopics(m.theta).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ta = (0L until 10L).map(topics).toSet
    val tb = (10L until 20L).map(topics).toSet
    assert(ta.size == 1 && tb.size == 1 && ta != tb)
    // the dominant topic holds essentially all mixture mass
    val th = m.theta.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(th.filter(t => topics(t._1) == t._2).forall(_._3 > 900000L))

    val m2 = Plsa.fit(tok.repartition(7), "d", "w", "c", k = 2, iters = 8)
    assert(m2.phi.orderBy("z", "w").collect().toSeq ==
      m.phi.orderBy("z", "w").collect().toSeq)
    assert(m2.theta.orderBy("d", "z").collect().toSeq ==
      m.theta.orderBy("d", "z").collect().toSeq)
  }

  test("ppm invariants: every (d,z)/(z,w) cell present, floor-normalized rows") {
    val docs = (0L until 8L).map(d => (d, s"w${d % 4} w${(d + 1) % 4} common w${d % 3}"))
    val m = Plsa.fit(tokens(docs), "d", "w", "c", k = 3, iters = 2)
    val nWords = m.phi.select("w").distinct().count()
    val thSums = m.theta.groupBy("d").agg(count(lit(1)).as("k"), sum("t").as("s"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(thSums.forall { case (k, s) => k == 3L && s <= 1000000L && s > 1000000L - 3 })
    val phSums = m.phi.groupBy("z").agg(count(lit(1)).as("nw"), sum("p").as("s"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(phSums.forall { case (nw, s) =>
      nw == nWords && s <= 1000000L && s > 1000000L - nWords })
  }

  test("foldIn: new docs against a frozen phi land on the right topic; OOV-only docs drop") {
    val a = (0L until 10L).map(d => (d, "ball game team win score"))
    val b = (10L until 20L).map(d => (d, "oven salt flour bake dough"))
    val m = Plsa.fit(tokens(a ++ b), "d", "w", "c", k = 2, iters = 8)
    val fitTopics = Plsa.docTopics(m.theta).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val aTopic = fitTopics(0L)
    val newDocs = Seq((100L, "ball game score"), (101L, "oven dough flour"),
      (102L, "zzz qqq")) // 102: no in-vocabulary words at all
    val th = Plsa.foldIn(tokens(newDocs), "d", "w", "c", m.phi, iters = 2)
    val nt = Plsa.docTopics(th).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(nt(100L) == aTopic && nt(101L) == 1 - aTopic)
    assert(!nt.contains(102L))
  }

  test("docTopics: argmax ties resolve to the smallest topic id") {
    val theta = Seq((1L, 0, 400000L), (1L, 1, 400000L), (1L, 2, 200000L))
      .toDF("d", "z", "t")
    val out = Plsa.docTopics(theta).head
    assert(out.getInt(1) == 0 && out.getLong(2) == 400000L)
  }
}
