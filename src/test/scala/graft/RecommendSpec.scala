package graft

import org.apache.spark.sql.functions._

import graft.operators.{Evaluate, Recommend}

/** r7 additions, fourth wave: collaborative filtering (item-item cosine
  * recs, rank-1 ALS) and the stratified-ATE causal estimator — hand
  * cases, valve semantics, determinism, convergence sanity. */
class RecommendSpec extends SparkSuite {
  import spark.implicits._

  // ---- itemItemRecs ---------------------------------------------------

  test("itemItemRecs: hand cosine and owned-item exclusion") {
    // u1: {a, b}; u2: {a, b}; u3: {a, c}. c_a = 3, c_b = 2, c_c = 1.
    // sim(a,b) = 2/sqrt(6), sim(a,c) = 1/sqrt(3) but support 1 < 2 ->
    // pruned. u3's rec: b via a: score = round(1e6*2/sqrt(6)) = 816497.
    val ui = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c")).toDF("u", "i")
    val out = Recommend.itemItemRecs(ui, "u", "i", topN = 5,
      minSupport = 2L, maxUserItems = 10).collect()
    // u1 and u2 own both a and b -> no candidates for them
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("user") == 3L && r.getAs[String]("item") == "b")
    assert(r.getAs[Long]("score_ppm") ==
      math.round(2.0 * 1e6 / math.sqrt(3.0 * 2.0)))
    assert(r.getAs[Long]("n_contrib") == 1L && r.getAs[Int]("rn") == 1)
  }

  test("itemItemRecs: maxUserItems valve drops the whale user entirely") {
    val whale = (1 to 20).map(i => (99L, s"i$i"))
    val ui = (Seq((1L, "i1"), (1L, "i2"), (2L, "i1"), (2L, "i2"),
      (3L, "i1")) ++ whale).toDF("u", "i")
    val out = Recommend.itemItemRecs(ui, "u", "i", topN = 5,
      minSupport = 2L, maxUserItems = 10).collect()
    // the whale neither contributes co-counts nor receives recs
    assert(!out.exists(_.getAs[Long]("user") == 99L))
    // i1-i2 co-count from u1, u2 only = 2; u3 gets i2 recommended
    val u3 = out.filter(_.getAs[Long]("user") == 3L)
    assert(u3.length == 1 && u3.head.getAs[String]("item") == "i2")
  }

  test("itemItemRecs: duplicate interactions collapse; layout invariant") {
    val ui = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a")).toDF("u", "i")
    val one = Recommend.itemItemRecs(ui, "u", "i").collect()
    val two = Recommend.itemItemRecs(ui.repartition(7), "u", "i").collect()
    assert(one.map(_.toSeq).toSet == two.map(_.toSeq).toSet)
    // dup (1, a) must not inflate c_a past 3 or co(a,b) past 2
    val r = one.filter(_.getAs[Long]("user") == 3L).head
    assert(r.getAs[Long]("score_ppm") ==
      math.round(2.0 * 1e6 / math.sqrt(3.0 * 2.0)))
  }

  // ---- als1 -----------------------------------------------------------

  test("als1: exactly factorizable rank-1 matrix is recovered") {
    // r = u x v with u = (1, 2), v = (3, 6): ratings 3, 6, 6, 12.
    // iter 1: v0 = 1e6 -> u_i = mean rating: u1 = 4.5e6? no — closed
    // form: u_i = sum(r*v)/sum(v^2) = (3+6)/2 = 4.5 -> 4500000;
    // u_2 = (6+12)/2 = 9e6. Then v_a = (3*4.5 + 6*9)/(4.5^2+9^2) =
    // 67.5/101.25 = 2/3 ... the product u*v converges to r exactly:
    // check u1*va ~ 3.0 after iter 2.
    val r = Seq((1L, "a", 3L), (1L, "b", 6L), (2L, "a", 6L),
      (2L, "b", 12L)).toDF("u", "i", "r")
    val (users, items) = Recommend.als1(r, "u", "i", col("r"), iters = 2)
    val uf = users.collect().map(x =>
      x.getAs[Long]("user") -> x.getAs[Long]("u_ppm")).toMap
    val vf = items.collect().map(x =>
      x.getAs[String]("item") -> x.getAs[Long]("v_ppm")).toMap
    // rank-1 structure: predictions match ratings to ppm rounding
    def pred(u: Long, i: String): Double =
      uf(u).toDouble * vf(i).toDouble / 1e12
    assert(math.abs(pred(1L, "a") - 3.0) < 1e-3)
    assert(math.abs(pred(1L, "b") - 6.0) < 1e-3)
    assert(math.abs(pred(2L, "a") - 6.0) < 1e-3)
    assert(math.abs(pred(2L, "b") - 12.0) < 1e-3)
  }

  test("als1: first sweep is the closed-form mean; layout invariant") {
    val r = Seq((1L, "a", 3L), (1L, "b", 6L), (2L, "a", 6L))
      .toDF("u", "i", "r")
    val (u1, _) = Recommend.als1(r, "u", "i", col("r"), iters = 1)
    val uf = u1.collect().map(x =>
      x.getAs[Long]("user") -> x.getAs[Long]("u_ppm")).toMap
    // v0 = 1: u_i = sum(r)/count = mean
    assert(uf(1L) == 4500000L && uf(2L) == 6000000L)
    val (u2, i2) = Recommend.als1(r.repartition(5), "u", "i",
      col("r"), iters = 2)
    val (u3, i3) = Recommend.als1(r, "u", "i", col("r"), iters = 2)
    assert(u2.collect().map(_.toSeq).toSet == u3.collect().map(_.toSeq).toSet)
    assert(i2.collect().map(_.toSeq).toSet == i3.collect().map(_.toSeq).toSet)
  }

  test("als1: oversized rating refuses loudly") {
    val r = Seq((1L, "a", 2000000L)).toDF("u", "i", "r")
    intercept[Exception] {
      Recommend.als1(r, "u", "i", col("r"))._1.collect()
    }
  }

  // ---- strataAte ------------------------------------------------------

  test("strataAte: hand two-strata weighted contrast") {
    // s1 (4 rows): treated mean 10, control mean 6 -> diff 4;
    // s2 (2 rows): treated 20, control 10 -> diff 10.
    // ate = (4*4 + 2*10)/6 = 6.
    val rows = Seq(("s1", true, 10L), ("s1", true, 10L),
      ("s1", false, 6L), ("s1", false, 6L),
      ("s2", true, 20L), ("s2", false, 10L)).toDF("s", "t", "v")
    val r = Evaluate.strataAte(rows, col("s"), col("t"), col("v"))
      .collect().head
    assert(r.getAs[Long]("n_strata") == 2L)
    assert(r.getAs[Long]("n_complete") == 2L)
    assert(r.getAs[Long]("n_used") == 6L)
    assert(math.abs(r.getAs[Double]("ate") - 6.0) < 1e-12)
  }

  test("strataAte: one-armed strata drop; all-dropped -> null ate") {
    val rows = Seq(("s1", true, 10L), ("s1", false, 4L),
      ("s2", true, 99L)).toDF("s", "t", "v")
    val r = Evaluate.strataAte(rows, col("s"), col("t"), col("v"))
      .collect().head
    assert(r.getAs[Long]("n_strata") == 2L && r.getAs[Long]("n_complete") == 1L)
    assert(r.getAs[Long]("n_used") == 2L)
    assert(math.abs(r.getAs[Double]("ate") - 6.0) < 1e-12)
    val bad = Seq(("s1", true, 10L)).toDF("s", "t", "v")
    val r2 = Evaluate.strataAte(bad, col("s"), col("t"), col("v"))
      .collect().head
    assert(r2.isNullAt(r2.fieldIndex("ate")))
  }

  test("strataAte: deterministic under repartition (sorted fold)") {
    val rows = spark.range(5000).select(
      pmod(col("id"), lit(37)).cast("string").as("s"),
      (pmod(col("id"), lit(2)) === 0).as("t"),
      pmod(xxhash64(col("id")), lit(1000L)).as("v"))
    val one = Evaluate.strataAte(rows, col("s"), col("t"), col("v"))
      .collect().head
    val two = Evaluate.strataAte(rows.repartition(11), col("s"),
      col("t"), col("v")).collect().head
    assert(one.getAs[Double]("ate") == two.getAs[Double]("ate"))
  }
}
