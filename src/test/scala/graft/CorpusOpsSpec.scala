package graft

import org.apache.spark.sql.functions._
import graft.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, GroupOps, TextSearch}

/** Round-4 corpus operators: unicode cleaning, hybrid RRF retrieval,
  * duplicated-span coverage, incremental (bloom-prefiltered) dedup. */
class CorpusOpsSpec extends SparkSuite {
  import spark.implicits._

  test("standardize: hand-checked z-scores, exact numerators, null rows excluded") {
    val df = Seq((1L, Some(1.0)), (2L, Some(2.0)), (3L, Some(3.0)),
      (4L, Option.empty[Double])).toDF("id", "v")
    val got = GroupOps.standardize(df, Seq("v" -> col("v")))
      .orderBy("id").collect()
    // q = 1e4, 2e4, 3e4 over n=3 (null excluded): znum = 3q - 6e4
    assert(got(0).getLong(2) == -30000L)
    assert(got(1).getLong(2) == 0L)
    assert(got(2).getLong(2) == 30000L)
    // z = znum / sqrt(3*1.4e9 - 3.6e9) = ±30000/sqrt(6e8) = ±sqrt(3/2)
    assert(math.abs(got(0).getAs[Double]("z_v_r") + 1.224745) < 1e-6)
    assert(got(1).getAs[Double]("z_v_r") == 0.0)
    assert(math.abs(got(2).getAs[Double]("z_v_r") - 1.224745) < 1e-6)
    // the null row stays a row, with null z outputs
    assert(got(3).isNullAt(2) && got(3).isNullAt(3))
  }

  test("percentileRank: doubled midranks, ties, nulls, group isolation") {
    val df = Seq(
      ("s1", 1L, Some(10L)), ("s1", 2L, Some(20L)), ("s1", 3L, Some(20L)),
      ("s1", 4L, Some(30L)), ("s1", 5L, Option.empty[Long]),
      ("s2", 6L, Some(10L))
    ).toDF("g", "id", "v")
    val out = GroupOps.percentileRank(df, Seq("g"), col("v"))
      .collect().map(r => r.getLong(1) ->
        ((if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    // s1 non-null n=4: v=10 -> d=2*0+1+1=2, pct=2e6 div 8=250000
    assert(out(1L) === ((2L, 250000L)))
    // v=20 ties: d=2*1+2+1=5, pct=5e6 div 8=625000
    assert(out(2L) === ((5L, 625000L)))
    assert(out(3L) === ((5L, 625000L)))
    // v=30: d=2*3+1+1=8, pct=8e6 div 8=1000000
    assert(out(4L) === ((8L, 1000000L)))
    // null value -> null outputs
    assert(out(5L) === ((-1L, -1L)))
    // s2 singleton: d=2, pct=2e6 div 2=1000000
    assert(out(6L) === ((2L, 1000000L)))
  }

  test("negativeSamples: in-range, positives never leak, <= kNeg, deterministic") {
    val pos = Seq((1L, 10L), (1L, 15L), (2L, 20L), (2L, 10L))
      .toDF("u", "i")
    val neg = GroupOps.negativeSamples(pos, "u", "i", kNeg = 6, seed = 5L)
    val rows = neg.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2)))
    val posSet = Set((1L, 10L), (1L, 15L), (2L, 20L), (2L, 10L))
    assert(rows.forall(r => r._3 >= 10L && r._3 <= 20L)) // observed range
    assert(rows.forall(r => !posSet((r._1, r._3)))) // no positive leaks
    val perUser = rows.groupBy(_._1).view.mapValues(_.length)
    assert(perUser.values.forall(_ <= 6))
    // deterministic across layouts
    val again = GroupOps.negativeSamples(pos.repartition(3), "u", "i",
        kNeg = 6, seed = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === rows.toSet)
    // all-positive range -> every draw collides -> zero negatives, no error
    val dense = Seq((1L, 5L), (1L, 6L)).toDF("u", "i")
    assert(GroupOps.negativeSamples(dense, "u", "i", 4, 1L).count() >= 0L)
    intercept[IllegalArgumentException] {
      GroupOps.negativeSamples(pos, "u", "i", kNeg = 300, seed = 1L)
    }
  }

  test("kFolds: exact per-stratum balance, disjoint cover, layout invariance") {
    val df = ((0L until 103L).map(i => (i, "en")) ++
      (200L until 207L).map(i => (i, "de"))).toDF("id", "lang")
    val out = GroupOps.kFolds(df, k = 5, seed = 9L, key = col("id"),
      strataCols = Seq("lang"))
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2)))
    assert(rows.length === 110) // every row assigned exactly once
    assert(rows.forall(r => r._3 >= 0 && r._3 < 5))
    // per-stratum fold sizes differ by at most 1
    for (lang <- Seq("en", "de")) {
      val sizes = rows.filter(_._2 == lang).groupBy(_._3)
        .map(_._2.length).toSeq
      assert(sizes.max - sizes.min <= 1, s"$lang sizes $sizes")
    }
    // 103 = 5*20+3 -> three folds of 21, two of 20
    val enSizes = rows.filter(_._2 == "en").groupBy(_._3)
      .view.mapValues(_.length).values.toSeq.sorted
    assert(enSizes === Seq(20, 20, 21, 21, 21))
    // deterministic under repartition
    val again = GroupOps.kFolds(df.repartition(7), 5, 9L, col("id"),
        Seq("lang"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again === rows.map(r => (r._1, r._3)).toSet)
    // empty strata would be a silent global window -> loud refusal
    intercept[IllegalArgumentException] {
      GroupOps.kFolds(df, 5, 9L, col("id"), Seq.empty)
    }
  }

  test("sampleWeightedK: exact k, weight monotonicity, null/zero excluded") {
    val df = (0L until 200L).map(i => (i, if (i < 100) 1.0 else 50.0))
      .toDF("id", "w")
    val got = GroupOps.sampleWeightedK(df, 40, col("w"), seed = 3L,
      key = col("id"))
    val rows = got.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length === 40)
    assert(rows.map(_._1).distinct.length === 40) // without replacement
    // heavy weights dominate the sample overwhelmingly
    assert(rows.count(_._2 == 50.0) >= 35)
    // selection == an in-memory replay of the same es order
    val all = GroupOps
      .sampleWeightedK(df, 200, col("w"), seed = 3L, key = col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val wantTop = all.sortBy { case (id, es) => (-es, id) }.take(40)
      .map(_._1).toSet
    assert(rows.map(_._1).toSet === wantTop)
    // zero/null weights never selected
    val bad = Seq((1000L, 0.0), (1001L, -2.0)).toDF("id", "w")
    assert(GroupOps.sampleWeightedK(df.union(bad), 300, col("w"), 3L,
      col("id")).where(col("id") >= 1000L).count() === 0L)
  }

  test("sampleWeightedK: same key and u, larger weight wins at k=1") {
    // two rows share the id key -> identical u; es = ln(u)/w is closer
    // to zero for the larger weight, so it must be chosen first
    val df = Seq((7L, "small", 1.0), (7L, "big", 100.0)).toDF("id", "tag", "w")
    val got = GroupOps.sampleWeightedK(df, 1, col("w"), seed = 1L,
      key = col("id")).select("tag").head.getString(0)
    assert(got === "big")
  }

  test("percentileRank: layout invariance") {
    val df = (0L until 300L).map(i => (s"g${i % 3}", i, (i * 7) % 50))
      .toDF("g", "id", "v")
    val a = GroupOps.percentileRank(df, Seq("g"), col("v"))
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSet
    val b = GroupOps.percentileRank(df.repartition(11), Seq("g"), col("v"))
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSet
    assert(a === b)
  }

  test("standardize: constant signal gives null z, zero numerator") {
    val df = Seq(1L, 2L, 3L).toDF("id").withColumn("c", lit(7.5))
    val got = GroupOps.standardize(df, Seq("c" -> col("c"))).collect()
    assert(got.forall(r => r.getLong(2) == 0L && r.isNullAt(3)))
  }

  test("normalize_text NFC fuses combining accents; strip_accents drops them") {
    // E + combining acute (U+0301), precomposed U+00EF, bare U+00F8 --
    // escapes explicit, no invisible codepoints in source
    val df = Seq(("CAFE\u0301 na\u00EFve \u00F8")).toDF("t")
      .select(
        length(col("t")).as("n_raw"),
        length(normalize_text(col("t"))).as("n_nfc"),
        strip_accents(col("t")).as("stripped"),
        TextFunctions.cleanText(lit("  A\u0301  B \t C  ")).as("clean"))
    val r = df.head
    assert(r.getInt(0) == 13 && r.getInt(1) == 12) // E+U+0301 fused
    assert(r.getString(2) == "CAFE naive \u00F8") // ø untouched
    assert(r.getString(3) == "a b c")
  }

  test("normalize_text and strip_accents are SQL-registered") {
    graft.functions.registerAll(spark)
    // Spark's chr() wraps at 256, so spell the combining mark as a
    // \uXXXX escape in the SQL literal instead
    val r = spark.sql(
      "SELECT strip_accents(normalize_text('Cafe\\u0301', 'NFC')) c")
      .head.getString(0)
    assert(r == "Cafe")
  }

  test("hybridRrf fuses both rankers; single-list docs score lower") {
    val docs = Seq(
      (0L, "spark query engine"), (1L, "spark table scan"),
      (2L, "unrelated prose entirely"), (3L, "table of contents"))
      .toDF("doc_id", "text")
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)),
      (2L, Seq(0.0, 1.0)), (3L, Seq(0.5, 0.5)))
      .toDF("vec_id", "embedding")
    val got = TextSearch.hybridRrf(docs, "doc_id", "text",
      vecs, "vec_id", "embedding", "spark table",
      Array(1.0, 0.0), k = 4, depth = 3)
      .collect()
    // doc 0/1 rank in both lists; doc 2 is text-absent and vector-last
    val byId = got.map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(byId(0L)._1 > 0 && byId(0L)._2 == 1)
    assert(byId(1L)._1 > 0 && byId(1L)._2 == 2)
    // rrf of a doc present in both lists beats one present in one
    val top = got.head
    assert(top.getLong(0) == 0L || top.getLong(0) == 1L)
    assert(byId.get(2L).forall(t => t._3 < byId(0L)._3))
    // absent rank encoded as 0, contributes nothing
    got.foreach { r => assert(r.getInt(1) >= 0 && r.getInt(2) >= 0) }
  }

  test("dupSpanCoverage: exact coverage of a planted shared run") {
    // docs 0/1 share tokens 'a b c d' (positions 0-3 in 0; 2-5 in 1)
    val d = Seq(
      (0L, "a b c d x y z w"),
      (1L, "p q a b c d r s"),
      (2L, "m n o t u v")).toDF("doc_id", "text")
    val got = Dedup.dupSpanCoverage(d, "doc_id", "text", n = 4)
      .orderBy("doc_id")
      .as[(Long, Int, Int, Double)].collect()
    assert(got(0) == ((0L, 8, 4, 0.5)))
    assert(got(1) == ((1L, 8, 4, 0.5)))
    assert(got(2) == ((2L, 6, 0, 0.0)))
  }

  test("dupSpanCoverage hot-shingle valve undercounts conservatively") {
    val d = Seq(
      (0L, "a b c d"), (1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val capped = Dedup.dupSpanCoverage(d, "doc_id", "text", n = 4, maxDocFreq = 2)
      .agg(sum("n_dup_tokens")).head.getLong(0)
    val full = Dedup.dupSpanCoverage(d, "doc_id", "text", n = 4)
      .agg(sum("n_dup_tokens")).head.getLong(0)
    assert(capped == 0L && full == 12L)
  }

  test("bloom incremental dedup equals the exact anti-join") {
    val corpus = (0L until 500L).map(i => (i, s"doc number $i content"))
      .toDF("id", "text")
    // batch: 100 overlapping keys, 400 new
    val batch = (0L until 500L).map(i =>
      (1000L + i, if (i < 100) s"doc number $i content" else s"fresh item $i"))
      .toDF("id", "text")
    val exact = Dedup.newAgainstCorpus(batch, corpus, col("text"), col("text"))
      .select("id").as[Long].collect().toSet
    val bloom = Dedup.newAgainstCorpusBloom(batch, corpus, col("text"), col("text"),
      expectedItems = 1000L, numBits = 1L << 14)
      .select("id").as[Long].collect().toSet
    assert(exact.size == 400)
    assert(bloom == exact)
  }

  test("plan shapes: RRF truncation is TakeOrdered, dup-spans never cross-join") {
    val docs = (0L until 50L).map(i => (i, s"token$i spark table x$i"))
      .toDF("doc_id", "text")
    val vecs = (0L until 50L).map(i => (i, Seq(i.toDouble, 1.0)))
      .toDF("vec_id", "embedding")
    val rrfPlan = TextSearch.hybridRrf(docs, "doc_id", "text", vecs,
      "vec_id", "embedding", "spark", Array(1.0, 0.0), k = 5, depth = 10)
      .queryExecution.executedPlan.toString
    // depth truncation must be per-partition top-k + merge, not a global sort
    assert(rrfPlan.contains("TakeOrderedAndProject"))
    val spanPlan = Dedup.dupSpanCoverage(docs, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(!spanPlan.contains("CartesianProduct") &&
      !spanPlan.contains("BroadcastNestedLoop"))
  }

  test("DocArray facade: cleanText / dupSpans / newAgainst / findHybrid") {
    val da = DocArray((0L until 20L).map(i =>
        (i, s"The  Word\u0301 $i spark table")).toDF("id", "text"),
      idCol = "id")
    assert(da.cleanText().df.select("text").as[String].head.contains("word"))
    assert(da.dupSpans(2).count() == 20)
    val corpus = DocArray((0L until 10L).map(i =>
      (100L + i, s"the word\u0301 $i spark table")).toDF("id", "text"))
    assert(da.newAgainst(corpus, org.apache.spark.sql.functions.lower(col("text")))
      .count() == 20) // accents differ pre-clean -> all new
    val vecs = DocArray((0L until 20L).map(i =>
      (i, Seq(i.toDouble, 1.0))).toDF("id", "embedding"))
    assert(da.findHybrid("spark", Array(1.0, 0.0), k = 5, vectors = vecs)
      .count() == 5)
  }

  test("jaccardPairsAgainst: bipartite pairs only, exact jaccard, valve works") {
    val batch = Seq((1L, "a b c d"), (3L, "x y z w"), (5L, "a b q r"))
      .toDF("id", "text")
    val corpus = Seq((0L, "a b c d"), (2L, "m n o p")).toDF("id", "text")
    val got = Dedup.jaccardPairsAgainst(batch, corpus, "id", "text",
      threshold = 0.2, ngram = 1)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    // (1,0) identical sets j=1.0; (5,0) shares {a,b} of 6 -> 1/3
    assert(got.toSeq == Seq((1L, 0L, 1.0), (5L, 0L, 2.0 / 6.0)))
    // same-side near-dups (1 vs 5) must NOT pair
    assert(!got.exists(r => r._1 == 1L && r._2 == 5L))
    val capped = Dedup.jaccardPairsAgainst(batch, corpus, "id", "text",
      threshold = 0.2, ngram = 1, maxDocFreq = 0).count()
    assert(capped == 0L)
  }

  test("jaccardPairsAgainst valve scores exactly on the filtered universe") {
    // 'a' is hot on the left (3 docs > maxDocFreq=2) → removed from BOTH
    // sides and from the set sizes: (1,0) scores |{b,c}| / |{b,c,d,e}|
    // = 0.5, not the old biased 2/(4+4-2) = 1/3 that left hot shingles
    // in the denominators
    val batch = Seq((1L, "a b c d"), (3L, "a x y z"), (5L, "a p q r"))
      .toDF("id", "text")
    val corpus = Seq((0L, "a b c e")).toDF("id", "text")
    val got = Dedup.jaccardPairsAgainst(batch, corpus, "id", "text",
      threshold = 0.4, ngram = 1, maxDocFreq = 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 0L, 0.5)))
  }

  test("maskDupSpans drops exactly the covered tokens, keeps order") {
    val d = Seq(
      (0L, "a b c d x y z w"),
      (1L, "p q a b c d r s"),
      (2L, "m n o t u v")).toDF("doc_id", "text")
    val got = Dedup.maskDupSpans(d, "doc_id", "text", n = 4)
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect()
    assert(got(0) == ((0L, 8, 4, "x y z w")))
    assert(got(1) == ((1L, 8, 4, "p q r s")))
    assert(got(2) == ((2L, 6, 6, "m n o t u v")))
  }

  test("maskDupSpans: fully-duplicated doc masks to empty, not null") {
    val d = Seq((0L, "a b c d"), (1L, "a b c d")).toDF("doc_id", "text")
    val got = Dedup.maskDupSpans(d, "doc_id", "text", n = 4)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(got.forall(r => r._3 == 0 && r._4 == ""))
  }

  test("randomProjection: deterministic, sign-balanced, JL-ish distance preservation") {
    import graft.operators.Ann
    val rng = new scala.util.Random(7)
    val vecs = (0L until 200L).map(i =>
      (i, Seq.fill(64)(rng.nextGaussian().toFloat))).toDF("id", "v")
    val proj = vecs.select(col("id"),
      Ann.randomProjection(col("v"), 64, 16, seed = 9).as("p"))
    // deterministic across evaluations
    val a = proj.orderBy("id").collect().map(_.getSeq[Double](1))
    val b = proj.orderBy("id").collect().map(_.getSeq[Double](1))
    assert(a.toSeq.map(_.toSeq) == b.toSeq.map(_.toSeq))
    // E[|Rx|^2] = dim_out/... — with ±1 signs, E[|Rx|²] = outDim·|x|²;
    // check the norm ratio concentrates (JL): mean within 25%
    val ratios = vecs.join(proj, "id").select(
      (aggregate(col("p"), lit(0.0), (s, x) => s + x * x) /
       (aggregate(col("v").cast("array<double>"), lit(0.0), (s, x) => s + x * x)
         * 16.0)).as("r")).as[Double].collect()
    val mean = ratios.sum / ratios.length
    assert(mean > 0.75 && mean < 1.25, s"norm ratio mean $mean")
  }

  test("sampleWeighted: endpoints exact, fraction tracks the weight") {
    import graft.operators.GroupOps
    val d = spark.range(10000).toDF("id")
    assert(GroupOps.sampleWeighted(d, lit(0.0), 1L, col("id")).count() == 0)
    assert(GroupOps.sampleWeighted(d, lit(1.0), 1L, col("id")).count() == 10000)
    val kept = GroupOps.sampleWeighted(d, lit(0.3), 1L, col("id")).count()
    assert(kept > 2700 && kept < 3300, s"kept $kept of 10000 at w=0.3")
    // deterministic: same seed/key → same rows
    val s1 = GroupOps.sampleWeighted(d, lit(0.3), 1L, col("id"))
      .as[Long].collect().toSet
    val s2 = GroupOps.sampleWeighted(d, lit(0.3), 1L, col("id"))
      .as[Long].collect().toSet
    assert(s1 == s2)
  }

  test("semanticPairs finds planted near-dups inside learned clusters") {
    import graft.operators.Dedup
    val rng = new scala.util.Random(11)
    // 4 well-separated gaussian clusters of 30 docs, plus planted
    // near-identical twins inside cluster 0
    val base = Array.tabulate(4)(c => Array.tabulate(8)(d =>
      if (d % 4 == c % 4) 5.0 else 0.0))
    val docs = (0 until 120).map { i =>
      val c = i % 4
      val v = base(c).map(x => (x + rng.nextGaussian() * 0.3).toFloat)
      (i.toLong, v.toSeq)
    } ++ Seq((200L, base(0).map(_.toFloat + 0.001f).toSeq),
             (201L, base(0).map(_.toFloat + 0.002f).toSeq))
    val df = docs.toDF("id", "v")
    val pairs = Dedup.semanticPairs(df, "id", "v",
      threshold = 0.0001, nCells = 4, seed = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((200L, 201L)))
    // verify step is exact: no pair below the cosine threshold leaks in
    val all = Dedup.semanticPairs(df, "id", "v",
      threshold = 0.0001, nCells = 4, seed = 3)
      .as[(Long, Long, Double)].collect()
    assert(all.forall(_._3 < 0.0001))
  }

  test("semanticDedup keeps the best copy per duplicate cluster") {
    import graft.operators.Dedup
    val df = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 5),
      (1L, Seq(1f, 0.001f, 0f, 0f), 9), // near-dup of 0, higher score
      (2L, Seq(0f, 0f, 1f, 0f), 3))
      .toDF("id", "v", "score")
    val kept = Dedup.semanticDedup(df, "id", "v", threshold = 0.001,
      nCells = 2, score = col("score"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("bloom prefilter routes only maybe-rows into the verify join") {
    // tiny filter → high fpp → still exact (verify join catches FPs)
    val corpus = (0L until 200L).map(i => (i, s"k$i")).toDF("id", "text")
    val batch = (0L until 200L).map(i => (500L + i, s"new$i")).toDF("id", "text")
    val bloom = Dedup.newAgainstCorpusBloom(batch, corpus, col("text"), col("text"),
      expectedItems = 200L, numBits = 256L)
      .count()
    assert(bloom == 200L)
  }

  test("rebalanceToQuota: exact quotas, cyclic oversample, layout-invariant") {
    import graft.operators.GroupOps
    // small (3 rows), exact (5), large (12) groups → all three regimes
    val df = ((0 until 3).map(i => ("s", i.toLong)) ++
      (10 until 15).map(i => ("m", i.toLong)) ++
      (20 until 32).map(i => ("l", i.toLong))).toDF("g", "id")
    val out = GroupOps.rebalanceToQuota(df, quota = 5, seed = 7L,
      col("g"), col("id"))
    val byG = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(byG.view.mapValues(_.length).toMap == Map("s" -> 5, "m" -> 5, "l" -> 5))
    // small group: cyclic repeat — ranks 1,2 get 2 copies (rep 0,1), rank 3 one
    val sCopies = byG("s").groupBy(_._2).view.mapValues(_.map(_._3).sorted.toList).toMap
    assert(sCopies.values.toList.sortBy(-_.length).map(_.length).sorted.reverse == List(2, 2, 1))
    sCopies.values.foreach(reps => assert(reps == reps.indices.map(_.toLong).toList))
    // large group: 5 distinct rows, all rep 0
    assert(byG("l").map(_._2).distinct.length == 5 && byG("l").forall(_._3 == 0L))
    // deterministic under repartition
    val out2 = GroupOps.rebalanceToQuota(df.repartition(7), quota = 5, seed = 7L,
      col("g"), col("id")).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out2 == out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("quantileNormalize: one group maps to itself; shifted group maps over") {
    // group A IS the pool shape: identity mapping
    val a = Seq.tabulate(10)(i => ("A", i.toLong * 10)).toDF("g", "v")
    val gotA = GroupOps.quantileNormalize(a, Seq("g"), col("v"))
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(gotA.forall { case (v, qn) => v == qn })

    // B is A shifted by +1000: pooled mapping sends each group's k-th
    // value to the pooled value at its own percentile
    val ab = (Seq.tabulate(10)(i => ("A", i.toLong * 10)) ++
      Seq.tabulate(10)(i => ("B", 1000L + i * 10))).toDF("g", "v")
    val got = GroupOps.quantileNormalize(ab, Seq("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4))
      .toMap
    // within-group pct of the k-th of 10 is (2k+1)/20 -> pooled rank
    // ceil(pct*20/1e6); A's k-th and B's k-th share a pct, so they map
    // to the SAME pooled value
    (0 until 10).foreach { k =>
      assert(got(("A", k.toLong * 10)) == got(("B", 1000L + k * 10)))
    }
    // monotone in k and drawn from the pooled values
    val pooled = ab.select("v").collect().map(_.getLong(0)).toSet
    assert(got.values.forall(pooled.contains))

    // layout invariance
    val again = GroupOps.quantileNormalize(ab.repartition(5), Seq("g"),
      col("v")).collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(again == got)
  }

  test("fellegiSunter: weights, null = 0 contribution, decision bands") {
    val (wa, wd) = Dedup.fsWeightsPpb(0.75, 0.0625)
    val (wa2, wd2) = Dedup.fsWeightsPpb(0.5, 0.25)
    val pairs = Seq(
      (1L, 2L, Some(true), Some(true)),
      (1L, 3L, Some(false), Some(true)),
      (1L, 4L, None, Some(false))).toDF("a", "b", "f1", "f2")
    val got = Dedup.fellegiSunter(pairs,
        Seq(("f1", 0.75, 0.0625), ("f2", 0.5, 0.25)),
        upperPpb = wa, lowerPpb = wd)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(4), r.getString(5))).toMap
    assert(got((1L, 2L)) == (wa + wa2, "match")) // >= upper
    assert(got((1L, 3L)) == (wd + wa2, "possible"))
    assert(got((1L, 4L)) == (0L + wd2, "possible")) // null field adds 0
    // degenerate thresholds rejected
    intercept[IllegalArgumentException] {
      Dedup.fellegiSunter(pairs, Seq(("f1", 0.5, 0.75)), 0L, 0L)
    }
  }

  test("scriptCounts: hand-mixed string, disjoint classes sum to n, null text zeros") {
    val r = Seq(Tuple1("Ab1 Пр 你 γ ع!")).toDF("t")
      .select(TextFunctions.scriptCounts(col("t")).as("s"))
      .select("s.*").head
    val Seq(latin, digit, cyr, greek, arabic, cjk, space, other, n) =
      (0 until 9).map(r.getLong)
    assert(latin == 2L && digit == 1L && cyr == 2L && greek == 1L)
    assert(arabic == 1L && cjk == 1L && space == 4L && other == 1L) // '!'
    assert(n == 13L &&
      latin + digit + cyr + greek + arabic + cjk + space + other == n)
    val z = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(TextFunctions.scriptCounts(col("t")).as("s"))
      .select("s.*").head
    assert((0 until 9).forall(z.getLong(_) == 0L))
  }

  test("clusterTerms: cluster-exclusive term outranks shared boilerplate, topK caps") {
    val docs = Seq(
      ("a", "common words here zebra zebra zebra"),
      ("a", "common words zebra"),
      ("b", "common words here yak yak"),
      ("b", "common words yak yak")).toDF("cl", "text")
    val got = TextSearch.clusterTerms(docs, col("cl"), col("text"), 2)
      .collect().map(r => (r.getString(0), r.getInt(4)) -> r.getString(1))
      .toMap
    // the exclusive heavy term wins each cluster; boilerplate ranks lower
    assert(got(("a", 1)) == "zebra" && got(("b", 1)) == "yak")
    assert(got.size == 4) // topK = 2 per cluster, nothing more
  }

  test("robustZ: hand med/MAD, whale immune, constant-majority null, group isolation") {
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L),
      ("g", 4L, 100L), ("h", 5L, 7L), ("h", 6L, 7L), ("h", 7L, 9L))
      .toDF("c", "id", "x")
    val got = GroupOps.robustZ(df, Seq("c"), "id", col("x"))
      .collect().map(r => r.getLong(1) ->
        (r.getLong(3), r.getLong(4), if (r.isNullAt(5)) Double.NaN
         else r.getDouble(5))).toMap
    // g: sorted 1,2,3,100 -> med2 = 5; dev = 3,1,1,195 -> mad2 = 1+3 = 4
    assert(got(1L)._1 == 5L && got(1L)._2 == 4L)
    assert(math.abs(got(4L)._3 - 2.0 * 195.0 / (1.4826 * 4.0)) < 1e-9)
    assert(math.abs(got(1L)._3 - 2.0 * -3.0 / (1.4826 * 4.0)) < 1e-9)
    // the whale barely moves the scale: z of ordinary rows stays O(1)
    assert(math.abs(got(2L)._3) < 1.0)
    // h: majority at 7 -> med2 = 14, dev = 0,0,4 -> mad2 = 0 -> null z
    assert(got(5L)._2 == 0L && got(5L)._3.isNaN)
  }

  test("snapshotDiff: all four statuses, duplicate-id rejection") {
    val oldDf = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "ct")
    val newDf = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("id", "ct")
    val got = Dedup.snapshotDiff(oldDf, newDf, "id", col("ct"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    val dup = Seq((1L, "a"), (1L, "a2")).toDF("id", "ct")
    intercept[IllegalArgumentException] {
      Dedup.snapshotDiff(dup, newDf, "id", col("ct"))
    }
  }
}
