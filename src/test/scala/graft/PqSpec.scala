package graft

import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.Ann

/** IVF-PQ: product-quantized codes, ADC lookup-table scan, persistence. */
class PqSpec extends SparkSuite {
  import spark.implicits._

  private def key(d: org.apache.spark.sql.DataFrame) =
    d.select("query_id", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("pq_encode picks the nearest codeword per subspace, first-wins ties") {
    // 2 subspaces × 2 dims; subspace 0 has an exact tie between
    // codewords 0 and 1 for the point (0.5, 0.5)
    val cb: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)),
      Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)))
    val df = Seq(
      (0L, Seq(0.5f, 0.5f, 9.0f, 9.0f)), // tie in sub 0 -> code 0; sub 1 -> 1
      (1L, Seq(0.9f, 0.8f, 1.0f, 2.0f))  // sub 0 -> 1; sub 1 -> 0
    ).toDF("id", "embedding")
      .select(col("id"), bytes_to_ints(pq_encode(col("embedding"), 2, cb)).as("c"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(m(0L) == Seq(0, 1) && m(1L) == Seq(1, 0))
  }

  test("pq_encode nulls out dimension-mismatched vectors") {
    val cb: Seq[Seq[Seq[Double]]] = Seq(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)))
    val df = Seq((0L, Seq(0.9f, 0.8f)), (1L, Seq(0.9f, 0.8f, 0.7f)),
      (2L, Seq(0.9f)))
      .toDF("id", "embedding")
      .select(col("id"), pq_encode(col("embedding"), 2, cb).as("c"))
    val rows = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    // only the exactly-m*subDim vector encodes; short/long become null
    // (a zero-padded code would silently corrupt the ADC ranking)
    assert(!rows(0L) && rows(1L) && rows(2L))
  }

  // integer-valued vectors: every partial sum in the ADC tables and the
  // float kernel is an exact small integer, so a lossless codebook makes
  // the two paths bit-identical in every metric (addition-order-free)
  private lazy val intDf = (0 until 400).map { i =>
    (i.toLong, Seq.tabulate(6)(j => ((i * 31 + j * 57) % 8).toFloat))
  }.toDF("id", "embedding")

  test("ivf-pq: complete codebook reproduces the float search exactly") {
    val idx = Ann.ivfBuild(intDf, "id", "embedding", nCells = 4, seed = 5)
    val q = intDf.where(col("id") % 41 === 0)
    // 64 distinct subvectors per subspace, all captured by the fit
    val cb = Ann.pqTrain(intDf, "id", "embedding", m = 3, maxIter = 4)
    assert(cb.subDim == 2 && cb.m == 3)
    val pq = Ann.pqAttach(idx, cb)
    for (metric <- Seq("cosine", "euclidean", "sqeuclidean")) {
      val a = Ann.ivfSearchPq(pq, q, 5, metric = metric, nProbe = 2)
      val b = Ann.ivfSearchBlocked(idx, q, 5, metric = metric, nProbe = 2)
      assert(key(a) == key(b), s"ids/ranks differ: $metric")
      // distances too — exact arithmetic end to end
      val da = a.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      b.collect().foreach { r =>
        assert(da((r.getLong(0), r.getLong(1))) == r.getDouble(2), s"dist: $metric")
      }
    }
  }

  test("lossy pq + exact rerank recovers exact distances, recall stays high") {
    val df = (0 until 400).map { i =>
      val c = i % 5
      (i.toLong, Seq.tabulate(8)(j =>
        (c * 3.0 + math.sin(i * 0.61 + j * 0.9)).toFloat))
    }.toDF("id", "embedding")
    val idx = Ann.ivfBuild(df, "id", "embedding", nCells = 5, seed = 13)
    val q = df.where(col("id") % 37 === 0)
    val pq = Ann.pqAttach(idx, Ann.pqTrain(df, "id", "embedding", m = 4))
    val rr = Ann.ivfSearchPq(pq, q, 5, nProbe = 2, rerank = 15, docs = df)
      .collect()
    assert(rr.nonEmpty)
    val exactD = Ann.ivfSearchBlocked(idx, q, 5, nProbe = 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // rerank re-scores exactly: shared ids carry identical distances
    rr.foreach { r =>
      exactD.get((r.getLong(0), r.getLong(1))).foreach { d =>
        assert(r.getDouble(2) == d)
      }
    }
    val hit = rr.map(r => (r.getLong(0), r.getLong(1))).toSet
      .intersect(exactD.keySet).size
    assert(hit >= exactD.size * 9 / 10, s"$hit of ${exactD.size}")
  }

  // ---- residual (IVFADC) mode ----------------------------------------

  test("residual pq: complete codebook matches the float search per metric") {
    // continuous sin values: no distance ties, and 200 distinct residual
    // subvectors per subspace all become codewords (reconstruction exact)
    val df = (0 until 200).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 0.7 + j * 1.3).toFloat))
    }.toDF("id", "embedding")
    val idx = Ann.ivfBuild(df, "id", "embedding", nCells = 4, seed = 5)
    val q = df.where(col("id") % 41 === 0)
    val cb = Ann.pqTrainResidual(idx, m = 4, maxIter = 4)
    assert(cb.residual && cb.anchors.get.length == 4)
    val pq = Ann.pqAttach(idx, cb)
    for (metric <- Seq("cosine", "euclidean", "sqeuclidean", "inner_product")) {
      val a = Ann.ivfSearchPq(pq, q, 5, metric = metric, nProbe = 2)
      val b = Ann.ivfSearchBlocked(idx, q, 5, metric = metric, nProbe = 2)
      assert(key(a) == key(b), s"ids/ranks differ: $metric")
      // distances agree to rounding noise: the decomposed sum
      // ||q-a||^2 - 2(dot(q,r) - dot(a,r)) + ||r||^2 associates
      // differently from the direct kernel, so exact bit-equality is
      // not expected — 1e-9 is ~1e7 ulps of slack on O(1) distances
      val da = a.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      b.collect().foreach { r =>
        val d = da((r.getLong(0), r.getLong(1)))
        assert(math.abs(d - r.getDouble(2)) < 1e-9, s"dist: $metric")
      }
    }
  }

  test("residual codes beat raw codes at equal byte budget on clustered data") {
    // 5 directionally-separated clusters (center_c = 10·e_c, so cosine
    // tells them apart): a raw codebook must spend its 8 codewords per
    // subspace on cluster POSITIONS, a residual codebook spends all 8 on
    // within-cell detail (the anchors absorb position)
    val df = (0 until 500).map { i =>
      val c = i % 5
      (i.toLong, Seq.tabulate(8)(j =>
        ((if (j == c) 10.0 else 0.0) + math.sin(i * 0.61 + j * 0.9)).toFloat))
    }.toDF("id", "embedding")
    val idx = Ann.ivfBuild(df, "id", "embedding", nCells = 5, seed = 13)
    val q = df.where(col("id") % 37 === 0)
    val exact = Ann.ivfSearchBlocked(idx, q, 5, nProbe = 2)
    val raw = Ann.pqAttach(idx, Ann.pqTrain(df, "id", "embedding", m = 4, nCodes = 32))
    val res = Ann.pqAttach(idx, Ann.pqTrainResidual(idx, m = 4, nCodes = 32))
    def recall(hits: org.apache.spark.sql.DataFrame): Double = {
      val e = key(exact); val h = key(hits).map(t => (t._1, t._2))
      e.count(t => h.contains((t._1, t._2))).toDouble / e.size
    }
    val rRaw = recall(Ann.ivfSearchPq(raw, q, 5, nProbe = 2))
    val rRes = recall(Ann.ivfSearchPq(res, q, 5, nProbe = 2))
    info(s"raw=$rRaw residual=$rRes")
    assert(rRes > rRaw, s"residual $rRes should beat raw $rRaw")
    assert(rRes >= 0.9, s"residual recall $rRes")
  }

  test("residual pq: persisted layout round-trips anchors; append path encodes identically") {
    val mk = (r: Range) => r.map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 0.7 + j * 1.3).toFloat))
    }.toDF("id", "embedding")
    val base = mk(0 until 250)
    val extra = mk(250 until 300)
    val idx = Ann.ivfBuild(base, "id", "embedding", nCells = 4, seed = 3,
      center = true)
    val cb = Ann.pqTrainResidual(idx, m = 4)
    val dir = java.nio.file.Files.createTempDirectory("graftpqr").toString
    Ann.pqWriteIndex(Ann.pqAttach(idx, cb), dir)
    val loaded = Ann.pqReadIndex(spark, dir)
    assert(loaded.codebook == cb) // anchors included in the equality
    // incremental ingest goes through the SAME residual encode as build
    val delta = Ann.pqEncodeRows(idx, cb, Ann.assignRows(idx, extra))
    delta.write.mode("append").partitionBy("_cell").parquet(s"$dir/coded")
    val re = Ann.pqReadIndex(spark, dir)
    assert(re.coded.count() == 300)
    val fromAttach = Ann.pqAttach(Ann.ivfAppend(idx, extra), cb).coded
      .where(col("id") >= 250)
      .select(col("id"), bytes_to_ints(col("_code")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val fromDisk = re.coded.where(col("id") >= 250)
      .select(col("id"), bytes_to_ints(col("_code")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(fromDisk == fromAttach)
    // an appended doc finds itself through the loaded residual index
    val hits = Ann.ivfSearchPq(re, extra.where(col("id") >= 297), 1,
      nProbe = 1, rerank = 50, docs = base.unionByName(extra)).collect()
    assert(hits.length == 3)
    hits.foreach(r => assert(r.getLong(0) == r.getLong(1) && r.getInt(3) == 1))
  }

  test("pqTrainResidual is layout-independent") {
    val df = (0 until 500).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 0.7 + j * 1.3).toFloat))
    }.toDF("id", "embedding")
    val mkIdx = (d: org.apache.spark.sql.DataFrame) =>
      Ann.ivfBuild(d, "id", "embedding", nCells = 4, seed = 11)
    val a = Ann.pqTrainResidual(mkIdx(df.repartition(1)), m = 4, maxSample = 200)
    val b = Ann.pqTrainResidual(mkIdx(df.repartition(7, col("id"))), m = 4,
      maxSample = 200)
    assert(a == b)
  }

  test("pqTrain is layout-independent (deterministic sample and fit)") {
    val df = (0 until 500).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 0.7 + j * 1.3).toFloat))
    }.toDF("id", "embedding")
    val a = Ann.pqTrain(df.repartition(1), "id", "embedding", m = 4,
      maxSample = 200)
    val b = Ann.pqTrain(df.repartition(7, col("id")), "id", "embedding", m = 4,
      maxSample = 200)
    assert(a == b)
  }

  test("persisted ivf-pq: codes-only layout round-trips, scan is cell-pruned") {
    val pts = (0 until 300).map { i =>
      val c = i % 3
      val base = Array(c * 10.0f, c * -5.0f, c * 3.0f + 1f, 0.5f * c)
      (i.toLong, base.zipWithIndex.map { case (v, j) =>
        v + 0.01f * ((i * 31 + j * 7) % 10)
      }.toSeq)
    }
    val df = pts.toDF("id", "embedding")
    val idx = Ann.ivfBuild(df, "id", "embedding", nCells = 3, seed = 7)
    val pq = Ann.pqAttach(idx, Ann.pqTrain(df, "id", "embedding", m = 2))
    val dir = java.nio.file.Files.createTempDirectory("graftpq").toString
    Ann.pqWriteIndex(pq, dir)
    val loaded = Ann.pqReadIndex(spark, dir)
    assert(loaded.ivf.nCells == 3 && loaded.ivf.normalized)
    assert(loaded.codebook == pq.codebook)

    val q = df.where(col("id") < 10)
    val fromDisk = Ann.ivfSearchPq(loaded, q, 5, nProbe = 1,
      rerank = 5, docs = df)
    assert(key(fromDisk) == key(
      Ann.ivfSearchPq(pq, q, 5, nProbe = 1, rerank = 5, docs = df)))

    val pruned = Ann.prunedPqCoded(loaded, Seq(0))
    pruned.collect()
    val planStr = pruned.queryExecution.executedPlan.toString
    val scanLine = planStr.linesIterator
      .find(l => l.contains("/coded") && l.contains("FileScan"))
    assert(scanLine.isDefined, s"no coded scan found in:\n$planStr")
    assert("PartitionFilters: \\[[^\\]]*_cell".r.findFirstIn(scanLine.get).isDefined,
      s"coded scan not cell-pruned: ${scanLine.get}")
    assert(Ann.prunedPqCoded(loaded, Seq(0, 1, 2)) eq loaded.coded)
  }

  test("incremental ingest: assignRows + pqEncodeRows append into the layout") {
    val mk = (r: Range) => r.map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 0.7 + j * 1.3).toFloat))
    }.toDF("id", "embedding")
    val base = mk(0 until 250)
    val extra = mk(250 until 300)
    val idx = Ann.ivfBuild(base, "id", "embedding", nCells = 4, seed = 3,
      center = true)
    val cb = Ann.pqTrain(base, "id", "embedding", m = 4)
    val dir = java.nio.file.Files.createTempDirectory("graftpqa").toString
    Ann.pqWriteIndex(Ann.pqAttach(idx, cb), dir)

    // the delta alone is assigned + encoded and appended — no corpus
    // re-encode, no touching existing shards
    val delta = Ann.pqEncodeRows(idx, cb, Ann.assignRows(idx, extra))
    delta.write.mode("append").partitionBy("_cell").parquet(s"$dir/coded")

    val loaded = Ann.pqReadIndex(spark, dir)
    assert(loaded.coded.count() == 300)
    // appended codes are byte-identical to a direct encode of those rows
    val wantCodes = extra
      .select(col("id"), bytes_to_ints(
        pq_encode(col("embedding"), cb.subDim, cb.centroids)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val gotCodes = loaded.coded.where(col("id") >= 250)
      .select(col("id"), bytes_to_ints(col("_code")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(gotCodes == wantCodes)
    // and an appended doc is findable: its own vector returns itself.
    // rerank=50: the sin generator nearly repeats every ~9 ids, so
    // several near-twins share the query's PQ code and outrank it in
    // the ADC tie order (ties break by id) — a deep-enough exact refine
    // must surface the true self (distance exactly 0) at rank 1
    val hits = Ann.ivfSearchPq(loaded, extra.where(col("id") >= 297), 1,
      nProbe = 1, rerank = 50, docs = base.unionByName(extra)).collect()
    assert(hits.length == 3)
    hits.foreach(r => assert(r.getLong(0) == r.getLong(1) && r.getInt(3) == 1))

    // SQ twin: the encode-rows path matches a full attach on those rows
    val scb = Ann.sqTrain(base, "embedding")
    val sqDelta = Ann.sqEncodeRows(idx, scb, Ann.assignRows(idx, extra))
      .select(col("id"), bytes_to_ints(col("_code")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val sqWant = extra.select(col("id"), bytes_to_ints(
        sq_encode(col("embedding"), scb.mins, scb.deltas)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(sqDelta == sqWant)
  }

  test("jlProject: splitmix sign replay, exact integer sums, layout invariance") {
    val df = Seq(
      (0L, Seq(1.0f, -2.0f, 0.5f)),
      (1L, Seq(0.0f, 0.0f, 0.0f)),
      (2L, Seq(-1.5f, 1.0f, 2.0f))).toDF("id", "embedding")
    val outDim = 4; val seed = 9L; val scale = 1000L
    val got = Ann.jlProject(df, "id", "embedding", outDim, seed, scale)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // replay: sign(j,t) = +1 iff splitmix64(j*outDim + t + seed) even
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def sign(j: Int, t: Int): Long =
      if (java.lang.Math.floorMod(mix(j.toLong * outDim + t + seed), 2L) == 0L) 1L
      else -1L
    val vecs = Map(0L -> Seq(1.0f, -2.0f, 0.5f), 1L -> Seq(0f, 0f, 0f),
      2L -> Seq(-1.5f, 1.0f, 2.0f))
    for ((id, v) <- vecs; t <- 0 until outDim) {
      val want = v.indices.map(j =>
        sign(j, t) * math.round(v(j).toDouble * scale)).sum
      assert(got(id)(t) == want, s"id=$id t=$t")
    }
    // zero vector projects to zeros; layout invariance
    assert(got(1L) == Seq(0L, 0L, 0L, 0L))
    val got7 = Ann.jlProject(df.repartition(7), "id", "embedding",
        outDim, seed, scale)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got7 == got)
  }

  test("jlSearchRerank with rerank >= corpus equals exact bruteForce") {
    val rnd = new scala.util.Random(5)
    val docs = (0L until 80L).map(i =>
      (i, Seq.fill(24)(rnd.nextFloat() * 2 - 1))).toDF("id", "embedding")
    val queries = (0L until 6L).map(i =>
      (i, Seq.fill(24)(rnd.nextFloat() * 2 - 1))).toDF("id", "embedding")
    val exact = key(graft.operators.Knn.bruteForce(docs, queries, 5,
      "cosine"))
    val funnel = key(Ann.jlSearchRerank(docs, queries, 5, "cosine",
      outDim = 8, rerank = 80))
    assert(funnel == exact)
    // a narrow funnel still returns k ranked rows per query
    val narrow = Ann.jlSearchRerank(docs, queries, 5, "cosine",
      outDim = 8, rerank = 10)
    assert(narrow.groupBy("query_id").count()
      .select("count").as[Long].collect().forall(_ == 5L))
  }
}
