package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Ann, Knn}

/** Dev harness (declared scratch main like Scratch/ScratchIvf — not part
  * of the driver contract): one-off 10M×128 IVF-SQ8 proof through the
  * PERSISTED index path — build → writeIndex (cell-partitioned parquet)
  * → sqAttach/sqWriteIndex → search the codes-only layout from disk with
  * partition pruning. No corpus-sized cache anywhere (a 10M float
  * `assigned` cache OOMs a 96 GB heap via columnar-builder overhead —
  * measured; disk layout is the honest scale path anyway). Results land
  * in NOTES.md. */
object ScratchScale10m {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmp = java.nio.file.Files.createTempDirectory("scale10m").toString
    val n = 10000000L
    var t0 = System.nanoTime()
    Bench.benchDocs(spark, n, 128)
      .write.mode("overwrite").option("compression", "none")
      .parquet(s"$tmp/docs")
    val stored = spark.read.parquet(s"$tmp/docs")
    println(f"gen_write_10m=${(System.nanoTime() - t0) / 1e9}%.1f s")

    val queries100 = Bench.benchDocs(spark, 100L, 128)
    t0 = System.nanoTime()
    val exact = Knn.bruteForce(stored, queries100, 10, "cosine").cache()
    exact.count()
    println(f"knn_exact_10m=${(System.nanoTime() - t0) / 1e9}%.1f s")

    t0 = System.nanoTime()
    val built = Ann.ivfBuild(stored, "id", "embedding", nCells = 4096,
      maxIter = 8, fitSampleFraction = 0.02, center = true)
    Ann.writeIndex(built, s"$tmp/ivf")
    println(f"ivf_build_write_10m=${(System.nanoTime() - t0) / 1e9}%.1f s")
    val idx = Ann.readIndex(spark, s"$tmp/ivf")

    t0 = System.nanoTime()
    val cb = Ann.sqTrain(stored, "embedding")
    Ann.sqWriteIndex(Ann.sqAttach(idx, cb), s"$tmp/sq")
    println(f"sq_encode_write_10m=${(System.nanoTime() - t0) / 1e9}%.1f s")
    val sq = Ann.sqReadIndex(spark, s"$tmp/sq")

    val nProbe = 1638 // same 0.4 nominal fraction as the 1M config
    for (r <- 1 to 2) {
      t0 = System.nanoTime()
      Ann.ivfSearchSq(sq, queries100, 10, nProbe = nProbe).count()
      println(f"sq_search100_run$r=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    t0 = System.nanoTime()
    Ann.ivfSearchPruned(idx, queries100, 10, nProbe = nProbe).count()
    println(f"float_pruned_search100=${(System.nanoTime() - t0) / 1e9}%.1f s")

    val rec = Ann.recallAgainstExact(
      Ann.ivfSearchSq(sq, queries100, 10, nProbe = nProbe), exact)
    val recR = Ann.recallAgainstExact(
      Ann.ivfSearchSq(sq, queries100, 10, nProbe = nProbe,
        rerank = 50, docs = stored), exact)
    val frac = Ann.scanFraction(idx, queries100, nProbe = nProbe)
    println(f"recall10=$rec%.3f rerank_recall10=$recR%.3f scanfrac=$frac%.3f")
    spark.stop()
  }
}
