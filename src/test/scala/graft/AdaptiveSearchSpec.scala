package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Knn}

/** Per-query early-terminating IVF search (round 9): exhaustive-probe
  * equivalence, early retirement on easy geometry, duplicate handling
  * on spilled indexes, and honest cost accounting. */
class AdaptiveSearchSpec extends SparkSuite {
  import spark.implicits._

  private def uniformDocs(n: Long, dim: Int) = spark.range(n).select(
    col("id"),
    transform(sequence(lit(0), lit(dim - 1)), j =>
      (pmod(xxhash64(col("id"), j), lit(10000)) / 10000.0)).as("embedding"))

  test("one full-depth block == ivfSearch at nProbe=nCells (exact top-k)") {
    val docs = uniformDocs(3000, 8)
    val q = docs.where(col("id") < 6)
    for (ma <- Seq(1, 2)) {
      val idx = Ann.ivfBuild(docs, "id", "embedding", nCells = 8,
        maxIter = 5, center = true, multiAssign = ma)
      val res = Ann.ivfSearchAdaptive(idx, q, 5, blockCells = 8)
      val ref = Ann.ivfSearch(idx, q, 5, nProbe = 8)
        .select("query_id", "id", "rank")
      val got = res.hits.select("query_id", "id", "rank")
      assert(got.exceptAll(ref).count() == 0 &&
        ref.exceptAll(got).count() == 0, s"multiAssign=$ma")
      assert(res.rounds == 1)
      // everything probed: scanned rows = Q × all stored rows
      assert(res.scannedRows == 6L * idx.assigned.count())
      // no duplicate ids per query even on the spilled index
      assert(res.hits.groupBy("query_id", "id").count()
        .where(col("count") > 1).count() == 0)
    }
  }

  test("easy geometry retires early: full recall at a fraction of the scan") {
    // 10 tight clusters far apart: every query's true top-k lives in its
    // own cell, so patience=1 retires after ~2 single-cell blocks
    val docs = spark.range(5000).select(col("id"),
      transform(sequence(lit(0), lit(7)), j =>
        (pmod(col("id"), lit(10)) * 100.0) +
          (pmod(xxhash64(col("id"), j), lit(100)) / 100.0)).as("embedding"))
    val idx = Ann.ivfBuild(docs, "id", "embedding", nCells = 10,
      maxIter = 8, center = true)
    val q = docs.where(col("id") < 5)
    val res = Ann.ivfSearchAdaptive(idx, q, 5, blockCells = 1,
      metric = "euclidean")
    val exact = Knn.bruteForce(docs, q, 5, "euclidean")
    assert(Ann.recallAgainstExact(res.hits, exact) == 1.0)
    // retired long before the 10-cell depth: mean probed ≤ 4 of 10
    assert(res.meanProbedCells <= 4.0,
      s"meanProbedCells=${res.meanProbedCells}")
    assert(res.scanFraction < 0.6, s"scanFraction=${res.scanFraction}")
  }

  test("sparse early cells do not retire a query before it has k hits") {
    // hand-built index: the query's FIRST cell holds 1 doc (< k=3) —
    // the retirement rule must read a growing candidate set as
    // improvement, not compare MaxValue to MaxValue and quit
    val assigned = Seq(
      (1L, Seq(0.5, 0.0), 0), (2L, Seq(9.0, 0.0), 1),
      (3L, Seq(11.0, 0.0), 1), (4L, Seq(19.0, 0.0), 2),
      (5L, Seq(20.0, 0.0), 2), (6L, Seq(21.0, 0.0), 2)
    ).toDF("id", "embedding", "_cell")
    val centroids = Seq((0, Seq(0.0, 0.0)), (1, Seq(10.0, 0.0)),
      (2, Seq(20.0, 0.0))).toDF("_cell", "_center")
    val idx = Ann.IvfIndex(assigned, centroids, "id", "embedding",
      nCells = 3, multiAssign = 1, normalized = false)
    val q = Seq((100L, Seq(0.0, 0.0))).toDF("id", "embedding")
    val res = Ann.ivfSearchAdaptive(idx, q, 3, metric = "euclidean",
      blockCells = 1, patience = 1)
    assert(res.hits.count() == 3)
    assert(res.hits.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("EMPTY early cells do not retire a query before it has k hits") {
    // r9 ADVICE regression: cells 0 and 1 hold NOTHING — a block landing
    // entirely in empty cells neither grows the set nor moves the k-th
    // distance, and with patience=1 the old rule retired the query with
    // zero hits even though cell 2 holds the whole corpus. While
    // best.size < k a round must never count as a miss.
    val assigned = Seq(
      (4L, Seq(19.0, 0.0), 2), (5L, Seq(20.0, 0.0), 2),
      (6L, Seq(21.0, 0.0), 2)
    ).toDF("id", "embedding", "_cell")
    val centroids = Seq((0, Seq(0.0, 0.0)), (1, Seq(10.0, 0.0)),
      (2, Seq(20.0, 0.0))).toDF("_cell", "_center")
    val idx = Ann.IvfIndex(assigned, centroids, "id", "embedding",
      nCells = 3, multiAssign = 1, normalized = false)
    val q = Seq((100L, Seq(0.0, 0.0))).toDF("id", "embedding")
    val res = Ann.ivfSearchAdaptive(idx, q, 3, metric = "euclidean",
      blockCells = 1, patience = 1)
    assert(res.hits.count() == 3)
    assert(res.hits.select("id").as[Long].collect().toSet ==
      Set(4L, 5L, 6L))
  }

  test("binary ids: cross-round duplicates of a multi-assigned doc collapse") {
    val assigned = Seq(
      (Array[Byte](1), Seq(2.0, 0.0), 0), (Array[Byte](1), Seq(2.0, 0.0), 1),
      (Array[Byte](2), Seq(6.0, 0.0), 1), (Array[Byte](2), Seq(6.0, 0.0), 0)
    ).toDF("id", "embedding", "_cell")
    val centroids = Seq((0, Seq(0.0, 0.0)), (1, Seq(5.0, 0.0)))
      .toDF("_cell", "_center")
    val idx = Ann.IvfIndex(assigned, centroids, "id", "embedding",
      nCells = 2, multiAssign = 2, normalized = false)
    val q = Seq((Array[Byte](9), Seq(0.0, 0.0))).toDF("id", "embedding")
    // blockCells=1: the two copies arrive in DIFFERENT rounds — the
    // driver merge must key on byte-array VALUE, not reference
    val res = Ann.ivfSearchAdaptive(idx, q, 2, metric = "euclidean",
      blockCells = 1, patience = 2)
    val ids = res.hits.select("id").collect().map(_.getAs[Array[Byte]](0).toSeq)
    assert(ids.length == 2 && ids.toSet.size == 2, s"got $ids")
  }

  test("driver probe state is loudly bounded (maxProbeState refusal)") {
    val docs = uniformDocs(500, 8)
    val idx = Ann.ivfBuild(docs, "id", "embedding", nCells = 8,
      maxIter = 3, center = true)
    val q = docs.where(col("id") < 100)
    // 100 queries x (probeDepth 8 + 2*dim 16) = 2400 ints > 64 ->
    // refuse, naming fixes (the bound charges the collected query
    // VECTORS too, not only the ranked-cell ints)
    val e = intercept[IllegalArgumentException] {
      Ann.ivfSearchAdaptive(idx, q, 5, maxProbeState = 64L)
    }
    assert(e.getMessage.contains("maxProbeState"))
    assert(e.getMessage.contains("maxProbe"))
    // a query set within the bound passes: 2 x 24 = 48 <= 64
    Ann.ivfSearchAdaptive(idx, q.limit(2), 5, maxProbeState = 64L)
  }

  test("SQ route at full depth + rerank >= corpus equals the float path") {
    // the equal-candidate-set lock: with patience covering every block,
    // width >= corpus keeps ALL scanned docs as candidates and the exact
    // rerank makes the coded screen lossless by construction
    val docs = uniformDocs(2000, 8)
    val q = docs.where(col("id") < 8)
    for (ma <- Seq(1, 2)) {
      val idx = Ann.ivfBuild(docs, "id", "embedding", nCells = 8,
        maxIter = 5, center = true, multiAssign = ma)
      val sq = Ann.sqAttach(idx, Ann.sqTrain(docs, "embedding"))
      val res = Ann.ivfSearchAdaptiveSq(sq, q, 5, blockCells = 2,
        patience = 4, rerank = 2000, docs = docs)
      val ref = Ann.ivfSearchAdaptive(idx, q, 5, blockCells = 2,
        patience = 4)
      def key(d: org.apache.spark.sql.DataFrame) =
        d.select("query_id", "id", "rank").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(key(res.hits) == key(ref.hits), s"multiAssign=$ma")
      // honest unit accounting: eq = codeScan/4 + reranked rows
      assert(res.eqScanFraction > 0.0 &&
        res.eqScanFraction < res.scanFraction * 0.25 + 1.0 + 1e-9)
      // float path reports eq == scanFraction (same unit, no codes)
      assert(ref.eqScanFraction == ref.scanFraction)
    }
  }

  test("SQ route runs off the persisted codes-only layout (empty assigned)") {
    // sqReadIndex returns assigned = coded.limit(0) by design — the
    // adaptive cost table must count the CODED side or a disk-loaded
    // index reports zero scan cost (and nothing to retire against)
    val docs = uniformDocs(1000, 6)
    val idx = Ann.ivfBuild(docs, "id", "embedding", nCells = 4,
      maxIter = 3, center = true)
    val sq = Ann.sqAttach(idx, Ann.sqTrain(docs, "embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graftsqad").toString
    Ann.sqWriteIndex(sq, dir)
    val loaded = Ann.sqReadIndex(spark, dir)
    val q = docs.where(col("id") < 4)
    def key(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val res = Ann.ivfSearchAdaptiveSq(loaded, q, 3, blockCells = 1,
      patience = 2, rerank = 10, docs = docs)
    val ref = Ann.ivfSearchAdaptiveSq(sq, q, 3, blockCells = 1,
      patience = 2, rerank = 10, docs = docs)
    assert(key(res.hits) == key(ref.hits))
    assert(res.scanFraction > 0.0 && res.scannedRows > 0L)
    assert(res.scanFraction == ref.scanFraction)
    // the static cost diagnostic must price the coded side too — off
    // the empty assigned frame it NPE'd (r10 review finding)
    val eq = Ann.sqScanEquivalent(loaded, q, nProbe = 2, rerank = 10)
    assert(eq > 0.0 &&
      eq == Ann.sqScanEquivalent(sq, q, nProbe = 2, rerank = 10))
  }

  test("PQ route at full depth + rerank >= corpus equals the float path") {
    // same equal-candidate-set lock as the SQ route, through the ADC
    // kernel — including multi-assign (a doc's per-home-cell residual
    // codes collapse by min before any top-k)
    val docs = uniformDocs(2000, 8)
    val q = docs.where(col("id") < 6)
    for (ma <- Seq(1, 2)) {
      val idx = Ann.ivfBuild(docs, "id", "embedding", nCells = 8,
        maxIter = 5, center = true, multiAssign = ma)
      val pq = Ann.pqAttach(idx,
        Ann.pqTrain(docs, "id", "embedding", m = 2, sampleFraction = 1.0))
      val res = Ann.ivfSearchAdaptivePq(pq, q, 5, blockCells = 2,
        patience = 4, rerank = 2000, docs = docs)
      val ref = Ann.ivfSearchAdaptive(idx, q, 5, blockCells = 2,
        patience = 4)
      def key(d: org.apache.spark.sql.DataFrame) =
        d.select("query_id", "id", "rank").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(key(res.hits) == key(ref.hits), s"multiAssign=$ma")
      // ratio: m=2 bytes vs 8 float dims -> subDim=4 -> 1/16 per code
      // row; at rerank = corpus EVERY doc reranks, so eq = scan/16 + 1
      // exactly (the rerank term honestly dominates at this width —
      // real configs rerank 50-200, not the corpus)
      assert(res.scanFraction == ref.scanFraction)
      assert(math.abs(res.eqScanFraction -
        (res.scanFraction / 16.0 + 1.0)) < 1e-9,
        s"eq=${res.eqScanFraction} scan=${res.scanFraction}")
      // static path too: ivfSearchPq on the multi-assigned index at
      // rerank >= corpus equals the float blocked kernel
      assert(key(Ann.ivfSearchPq(pq, q, 5, nProbe = 8, rerank = 2000,
        docs = docs)) == key(Ann.ivfSearchBlocked(idx, q, 5, nProbe = 8)),
        s"static multiAssign=$ma")
    }
  }

  test("SQ route cuts eqScanFraction ~4x at the same schedule") {
    val docs = uniformDocs(3000, 8)
    val q = docs.where(col("id") < 6)
    val idx = Ann.ivfBuild(docs, "id", "embedding", nCells = 8,
      maxIter = 5, center = true)
    val sq = Ann.sqAttach(idx, Ann.sqTrain(docs, "embedding"))
    val res = Ann.ivfSearchAdaptiveSq(sq, q, 5, blockCells = 8,
      patience = 1, rerank = 20, docs = docs)
    val ref = Ann.ivfSearchAdaptive(idx, q, 5, blockCells = 8,
      patience = 1)
    // same exhaustive one-round schedule: scanFraction equal, eq ~ /4
    assert(res.scanFraction == ref.scanFraction)
    val expectedEq = res.scanFraction * 0.25 + 6.0 * 20 / (6.0 * 3000)
    assert(math.abs(res.eqScanFraction - expectedEq) < 1e-9,
      s"eq=${res.eqScanFraction} expected=$expectedEq")
  }

  test("patience extends the search; maxProbe caps it") {
    val docs = uniformDocs(2000, 8)
    val idx = Ann.ivfBuild(docs, "id", "embedding", nCells = 16,
      maxIter = 5, center = true)
    val q = docs.where(col("id") < 4)
    val shallow = Ann.ivfSearchAdaptive(idx, q, 5, blockCells = 2,
      patience = 1)
    val deep = Ann.ivfSearchAdaptive(idx, q, 5, blockCells = 2,
      patience = 4)
    assert(deep.meanProbedCells >= shallow.meanProbedCells)
    val capped = Ann.ivfSearchAdaptive(idx, q, 5, blockCells = 2,
      maxProbe = 4, patience = 99)
    assert(capped.meanProbedCells <= 4.0)
  }
}
