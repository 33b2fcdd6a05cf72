package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: isolated gopher/repetition rows before/after the fused
  * TokenTopStats kernel. */
object ScratchGopher {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, runs: Int = 2)(f: => Unit): Unit = {
      var best = Double.MaxValue
      for (_ <- 0 until runs) {
        val t0 = System.nanoTime(); f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$name=$best%.2f")
    }
    spark.range(1000000).select(sum("id")).collect()
    val textDocs = spark.range(1000000L).select(
      concat_ws(" ", transform(sequence(lit(0), lit(19)),
        j => concat(lit("w"), pmod(xxhash64(col("id"), j), lit(50000)))))
        .as("text"))
    time("x_gopher_1m") {
      graft.operators.Quality.gopherQuality(textDocs, col("text"),
        minWords = 10, minDistinctStopwords = 0)
        .agg(sum(col("keep").cast("long"))).collect()
    }
    time("x_repetition_1m") {
      textDocs.select(
          graft.functions.TextFunctions.topWordFrac(col("text")).as("a"),
          graft.functions.TextFunctions.topBigramFrac(col("text")).as("b"),
          graft.functions.TextFunctions.dupWordFrac(col("text")).as("c"))
        .agg(sum("a"), sum("b"), sum("c")).collect()
    }
    spark.stop()
  }
}
