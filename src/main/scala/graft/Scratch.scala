package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Knn}

/** Throwaway scale experiment (not part of the contract): 10× the bench
  * scale to validate the shuffle/memory story. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALE $name -> $r in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    // --- 10M x 128 exact knn --------------------------------------------
    val docs10m = Bench.benchDocs(spark, 10000000L, 128)
      .repartition(64)
    time("gen10m_write") {
      docs10m.write.mode("overwrite").parquet("/tmp/scale/docs10m")
    }
    val stored = spark.read.parquet("/tmp/scale/docs10m")
    val q10 = Bench.benchDocs(spark, 10L, 128)
    time("knn_blocked_10m_q10") {
      Knn.bruteForceBlocked(stored, q10, 10, "cosine").collect().length
    }

    // --- 1M docs minhash LSH dedup --------------------------------------
    // synthetic text: ~120 tokens from a 50k vocab; docs i and i+500000
    // are exact dups for i < 2000 (planted 0.4% duplicate mass)
    val text = spark.range(1000000L).select(
      col("id"),
      concat_ws(" ", transform(sequence(lit(0), lit(119)),
        j => concat(lit("tok"),
          pmod(xxhash64(when(col("id") < 502000 && col("id") >= 500000,
            col("id") - 500000).otherwise(col("id")), j), lit(50000)))))
        .as("text"))
      .repartition(64)
    time("gen1m_text_write") {
      text.write.mode("overwrite").parquet("/tmp/scale/text1m")
    }
    val corpus = spark.read.parquet("/tmp/scale/text1m")
    time("minhash_lsh_1m") {
      Dedup.minhashLsh(corpus, "id", "text", threshold = 0.8,
        numHashes = 128, bands = 32, ngram = 2).count()
    }
    time("exact_dedup_1m") {
      Dedup.exact(corpus, "id", Seq("text")).where(col("n_copies") > 1).count()
    }
    spark.stop()
  }
}
