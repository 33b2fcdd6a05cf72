package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: the BQ funnel rows in isolation — pack, search, uniform
  * and clustered recall — for quiet-window measurement and the
  * clustered-corpus honest-regime number. Not part of the product
  * surface. */
object ScratchBq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Ann, Knn}

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    val docs = Bench.benchDocs(spark, 1000000L, 128)
    val dir = "/tmp/jl_bench_docs"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "_SUCCESS")))
      docs.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val queries100 = Bench.benchDocs(spark, 100, 128)

    var thr: (Long, Array[Long]) = null
    var words: org.apache.spark.sql.DataFrame = null
    time("bq_pack_1m") {
      thr = Ann.signThresholdsQ(stored, "embedding", 128)
      words = Ann.signWords(stored, "id", "embedding", dim = 128,
        threshQ = thr._2.toSeq, n = thr._1).cache()
      words.count()
    }
    for (r <- 1 to 3) time(s"bq_search100_run$r") {
      Ann.binarySearchRerankPrepacked(stored, words, queries100, 10,
        rerank = 200, dim = 128, threshQ = thr._2.toSeq,
        n = thr._1).count()
    }
    val exact = Knn.bruteForce(stored, queries100, 10, "cosine")
    println("bq_recall10_uniform=" + Ann.recallAgainstExact(
      Ann.binarySearchRerankPrepacked(stored, words, queries100, 10,
        rerank = 200, dim = 128, threshQ = thr._2.toSeq,
        n = thr._1), exact))

    // clustered corpus (the Bench generator, verbatim)
    val clDir = "/tmp/graft_bench/jl_clustered"
    def clustered(n: Long) = spark.range(n).select(
      col("id"),
      transform(sequence(lit(0), lit(127)), j =>
        ((pmod(xxhash64(pmod(col("id"), lit(1000)), j, lit(7)),
          lit(10000)) / 10000.0)
          + (pmod(xxhash64(col("id"), j, lit(8)), lit(10000)) / 80000.0))
          .cast("float")).as("embedding"))
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(clDir, "_SUCCESS")))
      clustered(1000000L).write.mode("overwrite").parquet(clDir)
    val clStored = spark.read.parquet(clDir)
    val clQueries = clustered(1000000L)
      .where(pmod(col("id"), lit(9999)) === 3).limit(100)
      .select((col("id") + 2000000000L).as("id"), col("embedding"))
    val clExact = Knn.bruteForce(clStored, clQueries, 10, "cosine")
    for (rr <- Seq(200, 1000)) {
      println(s"bq_recall10_clustered_rerank$rr=" +
        Ann.recallAgainstExact(
          Ann.binarySearchRerank(clStored, clQueries, 10, rerank = rr,
            dim = 128, center = true), clExact))
    }
    time("bq_clustered_search100_rerank1000") {
      Ann.binarySearchRerank(clStored, clQueries, 10, rerank = 1000,
        dim = 128, center = true).count()
    }
    spark.stop()
  }
}
