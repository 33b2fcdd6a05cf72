package graft

import org.apache.spark.sql.functions._
import graft.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

class DedupTextSpec extends SparkSuite {
  import spark.implicits._

  test("clusterSafeSplit: every cluster member shares one split, covers all") {
    val docs = (0L until 40L).map(i => (i, s"doc $i")).toDF("id", "text")
    // chain clusters {0..3}, {10,11}, singletons elsewhere
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val out = Dedup.clusterSafeSplit(docs, pairs, "id", seed = 7L,
        Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length === 40)
    // cluster-level split agreement — the leakage-safety invariant
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.length === 1)
    }
    val byId = out.map(r => r._1 -> r._2).toMap
    assert(Set(0L, 1L, 2L, 3L).map(byId) === Set(0L))
    assert(Set(10L, 11L).map(byId) === Set(10L))
    assert(byId(20L) === 20L)
    // with a fair seed all three splits appear across 38 clusters
    assert(out.map(_._3).distinct.toSet === Set("train", "val", "test"))
  }

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 0
    (2L, "completely different content about spark engines"),
    (3L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 0
    (4L, "Der schnelle braune Fuchs und der faule Hund")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per text") {
    val got = Dedup.exact(docs, "doc_id", Seq("text"))
      .orderBy("keep_id").collect()
    assert(got.length == 4)
    val zero = got.find(_.getLong(0) == 0L).get
    assert(zero.getLong(1) == 2L) // docs 0 and 3
  }

  test("jaccard pairs finds exact and near dups, not unrelated") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5, ngram = 1)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("minhash LSH finds the same high-jaccard pairs as exact") {
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", 0.5,
      numHashes = 64, bands = 32, ngram = 1)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5, ngram = 1)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
  }

  test("editDistancePairs: exact dup at dist 0, small edit verified, unrelated dropped") {
    val got = Dedup.editDistancePairs(docs, "doc_id", "text",
        maxRatioPct = 15, numHashes = 64, bands = 32, ngram = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got((0L, 3L)) === 0L)       // exact dup
    assert(got((0L, 1L)) === 3L)       // dog -> cat
    assert(got((1L, 3L)) === 3L)
    // unrelated docs never reach the verify output
    assert(!got.keySet.exists(p => p._1 == 2L || p._2 == 2L))
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("editDistancePairs: ratio threshold is integer-exact at the boundary") {
    // len 20 vs 20, dist 2 -> 2*100 <= 20*10 holds exactly at 10%
    val d = Seq(
      (0L, "aaaa bbbb cccc dddd "),
      (1L, "aaaa bbbb cccc ddzz "),  // dist 2 of len 20: ratio exactly 10%
      (2L, "aaaa bbbb cccc zzzz ")   // dist 4: 20% — over at maxRatioPct=10
    ).toDF("doc_id", "text")
    val pairs = Dedup.editDistancePairs(d, "doc_id", "text",
        maxRatioPct = 10, numHashes = 64, bands = 64, ngram = 1)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 2L)))
  }

  test("simhash: identical texts hamming 0; long near-dups found, unrelated not") {
    // simhash needs long token streams to be stable — short texts flip
    // too many bits per edit (that's what MinHash is for)
    val longA = (1 to 100).map(i => s"token$i").mkString(" ")
    val longB = (1 to 100).map(i => if (i % 50 == 0) "changed" else s"token$i").mkString(" ")
    val longC = (1 to 100).map(i => s"other$i word$i").mkString(" ")
    val d = Seq((0L, longA), (1L, longB), (2L, longC), (3L, longA))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((0L, 3L)) == 0)
    assert(pairs.get((0L, 1L)).exists(_ <= 10))
    assert(!pairs.contains((0L, 2L)))
  }

  test("embedding LSH near-dup recovers the exact pairs (tight threshold)") {
    // clustered vectors: near-identical pairs land in the same LSH buckets
    val pts = (0 until 60).map { i =>
      val c = i % 3
      (i.toLong, Seq.tabulate(8)(j =>
        (c * 5.0 + j * 0.7 + (i / 3) * 0.001).toFloat))
    }
    val df = pts.toDF("id", "embedding")
    val exact = Dedup.embeddingPairsExact(df, "id", "embedding", 1e-6)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // center=false: multi-cluster data has no sign bias to fix, and the
    // middle cluster sits at the corpus mean where centered residual
    // directions are unstable (the documented centering caveat)
    val lsh = Dedup.embeddingPairsLsh(df, "id", "embedding", dim = 8,
      threshold = 1e-6, center = false)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(lsh == exact)
  }

  test("repetition/format signals: line and symbol variants on multi-line text") {
    val docs = Seq(
      (1L, "the cat sat\nthe cat sat\n- bullet one\n- bullet two\nwinds down..."),
      (2L, "plain line\nanother line"),
      (3L, "# # # tags everywhere…"),
      (4L, "")).toDF("id", "text")
    val r = docs.select(col("id"),
      TextFunctions.dupLineFrac(col("text")).as("dl"),
      TextFunctions.bulletLineFrac(col("text")).as("bl"),
      TextFunctions.ellipsisLineFrac(col("text")).as("el"),
      TextFunctions.symbolWordRatio(col("text")).as("sw"))
      .orderBy("id").collect()
    // doc 1: 5 lines, one duplicated (2 copies -> 1/5 repeats); 2 bullets;
    // 1 ellipsis line
    assert(math.abs(r(0).getDouble(1) - 0.2) < 1e-9)
    assert(math.abs(r(0).getDouble(2) - 0.4) < 1e-9)
    assert(math.abs(r(0).getDouble(3) - 0.2) < 1e-9)
    assert(r(1).getDouble(1) == 0.0 && r(1).getDouble(2) == 0.0)
    // doc 3: 3 '#' + 1 '…' over 3 tokens ("tags", "everywhere" ... tokens
    // = lowercase alnum runs -> 2 tokens) -> 4/2
    assert(math.abs(r(2).getDouble(4) - 2.0) < 1e-9)
    // empty doc: all zeros, no division blowups
    assert(r(3).getDouble(1) == 0.0 && r(3).getDouble(4) == 0.0)
  }

  test("ngramContamination flags exact shared runs; hot-shingle valve drops stop-phrases") {
    val evalSet = Seq(
      (100L, "the secret benchmark answer is forty two exactly"),
      (101L, "a common preamble phrase here")).toDF("id", "text")
    val train = Seq(
      (1L, "we found the secret benchmark answer is forty two exactly in data"), // 100
      (2L, "a common preamble phrase here and nothing else"),                    // 101
      (3L, "completely clean text with no overlap whatsoever at all")
    ).toDF("id", "text")
    val got = Dedup.ngramContamination(train, evalSet, "id", "text", n = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
    // the valve: a shingle present in > maxDocFreq eval docs is dropped —
    // with both eval docs sharing a planted hot phrase, flags survive only
    // through their unique shingles
    val evalHot = Seq(
      (100L, "shared hot phrase marker the secret benchmark answer"),
      (101L, "shared hot phrase marker plus other words")).toDF("id", "text")
    val hotTrain = Seq(
      (1L, "shared hot phrase marker appears here too"),
      (2L, "totally unrelated content in every way")).toDF("id", "text")
    val capped = Dedup.ngramContamination(hotTrain, evalHot, "id", "text",
      n = 4, maxDocFreq = Some(1)).as[(Long, Long)].collect().toMap
    assert(capped.isEmpty) // only hot shingles matched -> all dropped
    val uncapped = Dedup.ngramContamination(hotTrain, evalHot, "id", "text",
      n = 4).as[(Long, Long)].collect().toMap
    assert(uncapped == Map(1L -> 2L))
  }

  test("clustersIncremental: delta fold-in equals full recompute (r8)") {
    // old corpus: chain {1,2,3} (cluster 1), pair {10,11} (cluster 10),
    // untouched {20,21} (cluster 20), singleton 30
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("a", "b")
    val oldNodes = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L, 30L).toDF("id")
    val asg = Dedup.clusters(oldPairs, oldNodes, "id")
    // batch: 0 bridges clusters 1 and 10 AND undercuts their min ids;
    // 40-41 is a purely-new pair; 50 is a pairless singleton
    val newPairs = Seq((0L, 3L), (0L, 11L), (40L, 41L)).toDF("a", "b")
    val newNodes = Seq(0L, 40L, 41L, 50L).toDF("id")
    val inc = Dedup.clustersIncremental(asg, newPairs, newNodes, "id")
      .as[(Long, Long)].collect().toMap
    val full = Dedup.clusters(
      oldPairs.unionByName(newPairs),
      oldNodes.unionByName(newNodes), "id")
      .as[(Long, Long)].collect().toMap
    assert(inc == full)
    // merged mega-cluster takes the NEW smaller id everywhere
    assert(Seq(0L, 1L, 2L, 3L, 10L, 11L).forall(inc(_) == 0L))
    // untouched cluster and old singleton pass through unchanged
    assert(inc(20L) == 20L && inc(21L) == 20L && inc(30L) == 30L)
    // new-only pair and pairless new node resolve
    assert(inc(40L) == 40L && inc(41L) == 40L && inc(50L) == 50L)
  }

  test("clusters: chain, triangle, singleton resolve to min-id components") {
    // chain 1-2-3-4-5 (transitivity the pair set alone can't express),
    // triangle 10-11-12, singleton 20
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val nodes = (Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 20L)).toDF("id")
    val got = Dedup.clusters(pairs, nodes, "id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
    // canonical selection keeps exactly the component minima + singletons
    val docs = nodes.withColumnRenamed("id", "id")
    assert(Dedup.dropByClusters(docs, pairs, "id")
      .as[Long].collect().toSet == Set(1L, 10L, 20L))

    // keep-best: highest score wins the cluster, ties break to min id
    val scored = docs.withColumn("q",
      org.apache.spark.sql.functions.when(col("id") === 4L, 9)
        .when(col("id").isin(11L, 12L), 7).otherwise(1))
    val kept = Dedup.dropByClustersBest(scored, pairs, "id", col("q"))
    assert(kept.select("id").as[Long].collect().toSet == Set(4L, 11L, 20L))
    assert(kept.columns.contains("cluster_id"))
  }

  test("embeddingPairsExact size guard trips before the cross join") {
    val df = (0 until 10).map(i => (i.toLong, Seq.tabulate(4)(_.toFloat)))
      .toDF("id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingPairsExact(df, "id", "embedding", 0.5, maxExactRows = 5L)
    }
    assert(e.getMessage.contains("maxExactRows"))
    // an explicit override lets a deliberate caller through
    assert(Dedup.embeddingPairsExact(df, "id", "embedding", 1e9,
      maxExactRows = 10L).count() == 45L)
  }

  test("embedding LSH pairs are invariant under repartitioning") {
    val pts = (0 until 120).map { i =>
      val c = i % 3
      (i.toLong, Seq.tabulate(8)(j =>
        (c * 5.0 + j * 0.7 + (i / 3) * 0.001).toFloat))
    }
    def run(parts: Int) =
      Dedup.embeddingPairsLsh(pts.toDF("id", "embedding").repartition(parts),
        "id", "embedding", dim = 8, threshold = 1e-6, center = false)
        .select("a", "b").as[(Long, Long)].collect().toSet
    val ref = run(1)
    assert(ref.nonEmpty)
    assert(run(7) == ref)
    assert(run(32) == ref)
  }

  test("embedding LSH: centering recovers planted twins in a positive cone") {
    // all-positive corpus = the sign-bias case centering exists for;
    // twins are far from the mean relative to their displacement.
    // (n=200, d=32 checked numerically: min non-twin cosine distance
    // 2.7e-7, max twin distance 1.4e-8 → threshold 1e-7 separates)
    val base = (0 until 200).map { i =>
      (i.toLong, Seq.tabulate(32)(j =>
        (0.5 + ((i.toLong * 2654435761L + j * 40503L) % 10007L) / 10007.0).toFloat))
    }
    val twins = base.collect { case (i, v) if i % 10 == 0 =>
      (i + 1000L, v.zipWithIndex.map { case (x, j) => x + (j % 5) * 1e-4f })
    }
    val df = (base ++ twins).toDF("id", "embedding")
    val got = Dedup.embeddingPairsLsh(df, "id", "embedding", dim = 32,
      threshold = 1e-7, nPlanes = 64, bandBits = 16)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == base.collect { case (i, _) if i % 10 == 0 => (i, i + 1000L) }.toSet)
  }

  test("embedding near-dup pairs under threshold") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.999f, 0.01f)), (2L, Seq(0.0f, 1.0f))
    ).toDF("id", "embedding")
    val got = Dedup.embeddingPairsExact(emb, "id", "embedding", 0.01)
      .select("a", "b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L)))
  }

  test("tokenizer, ngrams, counts") {
    val r = docs.where($"doc_id" === 0).select(
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.wordNgrams($"text", 2).as("g")).collect()(0)
    assert(r.getInt(0) == 9)
    assert(r.getSeq[String](1).head == "the quick")
    assert(r.getSeq[String](1).length == 8)
  }

  test("langId separates obvious en/de + cjk shortcut") {
    val t = Seq(
      (1, "the cat and the dog are in the house with a mouse"),
      (2, "der Hund und die Katze sind nicht im Haus"),
      (3, "这是 一个 中文 文档")
    ).toDF("i", "text")
    val got = t.select($"i", TextFunctions.langId($"text")).as[(Int, String)]
      .collect().toMap
    assert(got(1) == "en"); assert(got(2) == "de"); assert(got(3) == "zh")
  }

  test("quality score in [0,1], empty text lowest") {
    val t = Seq((1, "a solid length sentence with reasonable words inside it"),
      (2, ""), (3, "!!!! ???? ....")).toDF("i", "text")
    val got = t.select($"i", TextFunctions.qualityScore($"text"))
      .as[(Int, Double)].collect().toMap
    assert(got.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(got(1) > got(2)); assert(got(1) > got(3))
  }

  test("jaccardPairs maxDocFreq is exact on the hot-filtered universe") {
    // 'the' (df=3) is hot at maxDocFreq=2 and sits in doc 1 only of the
    // near-dup pair (1,2). Unfiltered J(1,2) = 2/4 = 0.5 < 0.6; on the
    // hot-filtered universe J = 2/3 >= 0.6. The old biased shape kept the
    // hot token in the set sizes (J = 2/(3+3-2) = 0.5) and silently
    // missed exactly this near-threshold pair.
    val d = Seq((1L, "the x y"), (2L, "x y w"), (3L, "the foo"),
      (4L, "the bar")).toDF("doc_id", "text")
    val uncapped = Dedup.jaccardPairs(d, "doc_id", "text", 0.6, ngram = 1)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(!uncapped.contains((1L, 2L)))
    val capped = Dedup.jaccardPairs(d, "doc_id", "text", 0.6, ngram = 1,
      maxDocFreq = 2).as[(Long, Long, Double)].collect()
    assert(capped.map(r => (r._1, r._2)).toSet == Set((1L, 2L)))
    assert(math.abs(capped.head._3 - 2.0 / 3.0) < 1e-9)
    // docs 3,4 share ONLY the hot token: filtered out entirely, no pair
    // a generous cap changes nothing
    val full = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5, ngram = 1)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val loose = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5, ngram = 1,
      maxDocFreq = 1000).select("a", "b").as[(Long, Long)].collect().toSet
    assert(loose == full)
  }

  test("topk heap handles duplicate distances deterministically by payload") {
    val df = Seq((1, 0.5, 10L), (1, 0.5, 11L), (1, 0.5, 12L), (1, 0.1, 13L))
      .toDF("g", "d", "id")
    val r = df.groupBy("g")
      .agg(graft.functions.topk_by_distance($"d", $"id", 2).as("t"))
      .select(explode($"t.value")).as[Long].collect().toSeq
    assert(r.length == 2 && r.head == 13L)
  }

  test("dedup results are partition-invariant") {
    val big = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(parts: Int) =
      Dedup.minhashLsh(big.repartition(parts), "doc_id", "text", 0.2,
        numHashes = 64, bands = 16, ngram = 2)
        .select("a", "b").as[(Long, Long)].collect().toSet
    assert(run(1) == run(11))
    def jac(parts: Int) =
      Dedup.jaccardPairs(big.repartition(parts), "doc_id", "text", 0.3, ngram = 2)
        .select("a", "b").as[(Long, Long)].collect().toSet
    assert(jac(2) == jac(13))
  }

  test("empty-text docs never become LSH/simhash candidates") {
    val d = Seq((0L, "real words shared across duplicates here ok"),
      (1L, "real words shared across duplicates here ok"),
      (2L, ""), (3L, ""), (4L, "   !!! ")).toDF("doc_id", "text")
    val mh = Dedup.minhashLsh(d, "doc_id", "text", 0.5, 64, 16, 1)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(mh == Set((0L, 1L))) // empties don't pair with each other
    val sh = Dedup.simhashPairs(d, "doc_id", "text", 5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(sh == Set((0L, 1L)))
  }

  test("fused minhash_text equals minhash_signature(wordNgrams)") {
    for (n <- Seq(1, 2, 3)) {
      val cmp = docs.select(
        minhash_text($"text", n, 32).as("fast"),
        minhash_signature(
          if (n == 1) TextFunctions.tokenSet($"text")
          else TextFunctions.wordNgrams($"text", n), 32).as("ref"))
        .collect()
      cmp.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"n=$n"))
    }
  }

  test("feature hashing is deterministic and sign-balanced-ish") {
    val d = docs.select(feature_hash(TextFunctions.tokens($"text"), 64)
      .as("emb"))
    val rows = d.collect().map(_.getSeq[Float](0))
    assert(rows.forall(_.length == 64))
    val again = d.collect().map(_.getSeq[Float](0))
    assert(rows.toSeq == again.toSeq)
  }

  test("rolling fingerprint: equal text equal print, diff text diff print") {
    val got = docs.select($"doc_id", rolling_fingerprint($"text", 8))
      .as[(Long, Long)].collect().toMap
    assert(got(0L) == got(3L))
    assert(got(0L) != got(2L))
  }

  test("dedupLinesKeepFirst keeps only the globally-first copy of each line") {
    val lines = Seq(
      (0L, 0, "accept all cookies"),
      (0L, 1, "real content a"),
      (1L, 0, "accept all cookies"), // corpus-wide dup of (0,0)
      (1L, 1, "real content b"),
      (2L, 0, "real content a"),     // corpus-wide dup of (0,1)
      (2L, 1, "accept all cookies")
    ).toDF("doc_id", "idx", "line")
    val kept = Dedup.dedupLinesKeepFirst(lines, "doc_id", "idx", "line")
      .select("doc_id", "idx").as[(Long, Int)].collect().toSet
    assert(kept == Set((0L, 0), (0L, 1), (1L, 1)))
  }

  test("tfidf ranks a rare term above a ubiquitous one") {
    val corpus = Seq(
      (0L, "common zebra"),
      (1L, "common other words"),
      (2L, "common more words")
    ).toDF("doc_id", "text")
    val top = graft.operators.TextSearch
      .tfidfTopTerms(corpus, "doc_id", "text", 2)
      .where(col("doc_id") === 0L).orderBy("rank")
      .select("term").as[String].collect()
    // zebra: tf=1 df=1 → w = ln(4/2)+1 ≈ 1.69; common: tf=1 df=3 → w = 1.0
    assert(top.head == "zebra")
    assert(top.toSet == Set("zebra", "common"))
  }

  test("cdc_chunks: chunks tile the input; insertions only re-chunk locally") {
    import graft.functions.cdc_chunks
    val base = (1 to 40).map(i => s"sentence number $i with some words.").mkString(" ")
    val shifted = "THIS ENTIRELY NEW PREFIX CHANGES EVERY FIXED OFFSET. " + base
    val df = Seq((1L, base), (2L, shifted), (3L, "")).toDF("id", "t")
      .withColumn("c", cdc_chunks(col("t"), 16, 5))
    val r = df.orderBy("id").collect()
    val c1 = r(0).getSeq[String](2)
    val c2 = r(1).getSeq[String](2)
    // tiling: concatenation reconstructs the input exactly
    assert(c1.mkString == base && c2.mkString == shifted)
    assert(r(2).getSeq[String](2).isEmpty)
    // shift robustness: the shifted doc re-chunks only near the splice --
    // most of the original doc's chunks survive verbatim
    val sharedFrac = c1.count(c2.toSet).toDouble / c1.size
    assert(c1.size > 5 && sharedFrac > 0.7, s"n=${c1.size} shared=$sharedFrac")
  }

  test("cdc_chunks: minLen suppresses cuts, maxLen forces them") {
    import graft.functions.cdc_chunks
    val text = (1 to 40).map(i => s"chunky text piece $i right here.").mkString(" ")
    val df = Seq(Tuple1(text)).toDF("t").select(
      cdc_chunks(col("t"), 16, 4).as("free"),
      cdc_chunks(col("t"), 16, 4, minLen = 64).as("floored"),
      cdc_chunks(col("t"), 16, 62, maxLen = 50).as("forced"))
    val r = df.head
    assert(r.getSeq[String](1).forall(c => c.length >= 64 ||
      c == r.getSeq[String](1).last)) // last chunk may be short
    // maskBits=62 -> no content cut ever fires; every cut is the forced one
    val forced = r.getSeq[String](2)
    assert(forced.init.forall(_.length == 50) && forced.mkString == text)
  }

  test("cdcSharedChunks counts cross-doc duplicated content through a shift") {
    val core = (1 to 30).map(i => s"shared corpus content block $i.").mkString(" ")
    val docs = Seq(
      (1L, core),
      (2L, "unrelated preamble that shifts every byte offset. " + core),
      (3L, "completely different text with no overlap at all whatsoever beyond sheer chance of tiny chunks never happening here")
    ).toDF("doc_id", "text")
    val r = Dedup.cdcSharedChunks(docs, "doc_id", "text", 16, 5)
      .orderBy("doc_id").collect()
    val (n1, s1) = (r(0).getInt(1), r(0).getInt(2))
    val (n3, s3) = (r(2).getInt(1), r(2).getInt(2))
    assert(s1.toDouble / n1 > 0.7, s"doc1 $s1/$n1")
    assert(r(1).getInt(2) > 0)
    assert(s3 == 0, s"doc3 shared $s3 of $n3")
  }

  test("cdc_chunks never splits a surrogate pair; astral text still tiles") {
    import graft.functions.cdc_chunks
    // emoji-dense text: enough astral chars that an unguarded cutter
    // would split a pair with overwhelming probability at maskBits=1
    val text = (1 to 300).map(i =>
      new String(Character.toChars(0x1F600 + i % 10)) + s" w$i").mkString(" ")
    val r = Seq(Tuple1(text)).toDF("t")
      .select(cdc_chunks(col("t"), 16, 1).as("c")).head.getSeq[String](0)
    assert(r.size > 10)
    assert(r.mkString == text) // tiling survives UTF-8 re-encode
    assert(!r.exists(c => c.nonEmpty &&
      Character.isHighSurrogate(c.last))) // no chunk ends mid-pair
  }

  test("incremental near-dup: persisted signature artifact, no raw corpus read") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely unrelated text about spark query planning internals"),
      (3L, "another unrelated document mentioning parquet column pruning")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again today"),
      (101L, "nothing like anything in the historical corpus whatsoever")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graftsigs").toString
    // day 0: sign the corpus once, persist the artifact
    Dedup.minhashSignatures(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    // day 1: the batch joins ONLY against the artifact
    val sigs = spark.read.parquet(dir)
    val out = Dedup.minhashAgainstSigs(
        Dedup.minhashSignatures(batch, "doc_id", "text"), sigs,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 1)
    val (a, b, est) = out.head
    assert(a == 100L && b == 1L && est > 0.5 && est <= 1.0)
    // estimator sanity: est is n/128 exactly
    assert((est * 128).isWhole)
  }

  test("winnowing: the w+k-1 guarantee, rightmost ties, density, pairs") {
    val rnd = new scala.util.Random(31)
    def randText(n: Int) = (0 until n).map(_ =>
      ('a' + rnd.nextInt(26)).toChar).mkString
    val shared = randText(20) // ≥ w + k − 1 = 11 ⇒ MUST share a fingerprint
    val docs = Seq(
      (1L, randText(150) + shared + randText(150)),
      (2L, randText(140) + shared + randText(160)),
      (3L, randText(300))).toDF("id", "t")
    val k = 8; val w = 4
    val fp = Dedup.winnowFingerprints(docs, "id", "t", k, w)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // the guarantee: docs 1 and 2 share at least one fingerprint value
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
    // expected density ≈ 2/(w+1): loose sanity band
    val n1 = fp.count(_._1 == 1L).toDouble
    val grams1 = (150 + 20 + 150) - k + 1 - (w - 1)
    assert(n1 / grams1 > 0.2 && n1 / grams1 < 0.6, s"density ${n1 / grams1}")
    // hand-check the selection on a tiny case: every window min, ties rightmost
    val tiny = Seq((9L, "abababab")).toDF("id", "t") // k-grams repeat → ties
    val tf = Dedup.winnowFingerprints(tiny, "id", "t", 2, 3)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    val h = (s: String) => graft.functions.Fnv64.hashString(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    val grams = (0 to 6).map(i => "abababab".substring(i, i + 2))
    val hs = grams.map(h)
    val want = (2 to 6).map { i =>
      val frame = (i - 2 to i).map(j => (hs(j), -j))
      val m = frame.min // (h asc, -pos asc) == rightmost min, Spark's rule
      (-m._2, m._1)
    }.distinct.sortBy(_._1)
    assert(tf.toList == want.toList)
    // pairs: the planted pair survives minShared, the random doc doesn't
    val pairs = Dedup.winnowPairs(docs, "id", "t", k, w, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containmentPairs: subset docs score 1.0 one-way, less the other") {
    val docs = Seq(
      (1L, "alpha beta gamma"), // contained in 2's shingle set
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta")).toDF("id", "t")
    val out = Dedup.containmentPairs(docs, "id", "t", threshold = 0.0,
        ngram = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // doc1: shingles {alpha beta, beta gamma} both inside doc2's 4
    assert(out((1L, 2L)) === ((2L, 2L, 1.0)))
    assert(out((2L, 1L)) === ((4L, 2L, 0.5)))
    assert(!out.keySet.exists(k => k._1 == 3L || k._2 == 3L))
  }

  test("containmentPairs: hot valve shrinks numerator AND denominator") {
    // shingle "x y" is in all three docs -> df=3 > 2 drops it everywhere
    val docs = Seq(
      (1L, "x y a"), (2L, "x y a b"), (3L, "x y z")).toDF("id", "t")
    val out = Dedup.containmentPairs(docs, "id", "t", threshold = 0.0,
        ngram = 2, maxDocFreq = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // doc1 kept shingles {y a}; doc2 kept {y a, a b}: containment 1/1
    assert(out((1L, 2L)) === ((1L, 1L, 1.0)))
    assert(out((2L, 1L)) === ((2L, 1L, 0.5)))
    // doc3's only surviving shingle {y z} shares nothing
    assert(!out.keySet.exists(k => k._1 == 3L || k._2 == 3L))
  }

  test("sortedNeighborhoodPairs: exact window semantics, ties by id, layout-invariant") {
    import org.apache.spark.sql.functions.col
    // keys: id1->10, id2->10 (tie), id3->20, id4->30, id5->40
    val df = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L), (5L, 40L))
      .toDF("id", "k")
    val out = Dedup.sortedNeighborhoodPairs(df, "id", col("k"), window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // sort order (k, id): 1,2,3,4,5 -> pairs with gap<=2
    val expect = Set((1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 1L), (2L, 4L, 2L),
      (3L, 4L, 1L), (3L, 5L, 2L), (4L, 5L, 1L))
    assert(out == expect)
    // brute-force parity on 100 random keys + repartition invariance
    val rnd = new scala.util.Random(11)
    val data = (1L to 100L).map(i => (i, rnd.nextInt(40).toLong))
    val w = 4
    val got = Dedup.sortedNeighborhoodPairs(
        data.toDF("id", "k").repartition(7), "id", col("k"), w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val order = data.sortBy(t => (t._2, t._1)).map(_._1).zipWithIndex
    val brute = (for {
      (a, ia) <- order; (b, ib) <- order
      if ib > ia && ib - ia <= w
    } yield (a, b, (ib - ia).toLong)).toSet
    assert(got == brute)
  }

  test("weightedOverlapPairs: idf-weighted containment, hot valve, integer threshold") {
    import org.apache.spark.sql.functions.col
    // bigrams: "a b" in all 4 docs (hot), "x y" in docs 1+2 (rare),
    // "p q"/"r s" distinctive singles
    val docs = Seq(
      (1L, "a b x y"), // bigrams: "a b","b x","x y"
      (2L, "a b x y"),
      (3L, "a b p q"),
      (4L, "a b r s")).toDF("id", "text")
    val out = Dedup.weightedOverlapPairs(docs, "id", "text",
        thresholdPpm = 0L, ngram = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    def idf(dfc: Int) = math.round(math.log(4.0 / dfc) * 1e6)
    // docs 1,2 share all three bigrams; w_a = idf(4)+idf(2)+idf(2)
    val w12 = idf(4) + 2 * idf(2)
    assert(out((1L, 2L)) == ((w12, w12, 1000000L)))
    // docs 3,4 share only the hot "a b" (idf 0 at df=4): w_shared = 0
    assert(out((3L, 4L))._1 == 0L)
    // hot valve: maxDocFreq=3 removes "a b" everywhere -> 3-4 pair gone
    val valved = Dedup.weightedOverlapPairs(docs, "id", "text",
        thresholdPpm = 1L, ngram = 2, maxDocFreq = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(valved == Set((1L, 2L)))
    // integer threshold: 1-2 at 1.0 survives ppm 999999, others don't
    val tight = Dedup.weightedOverlapPairs(docs, "id", "text",
        thresholdPpm = 999999L, ngram = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight == Set((1L, 2L)))
  }
}
