package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: times the x_bloom_20m bench body in isolation (the
  * crossJoin-materialization trap measured 959 s; the literal-bitmap
  * path should be ~seconds). Not part of the product surface. */
object ScratchBloom {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Sketch
    import graft.functions.splitmix64_rank
    val t0 = System.nanoTime()
    val small = spark.range(1000000L).select(
      pmod(xxhash64(col("id"), lit(71)), lit(50000000L)).as("k"))
    val big = spark.range(20000000L).select(
      pmod(xxhash64(col("id"), lit(72)), lit(50000000L)).as("k"))
    val n = Sketch.bloomPrefilter(big, splitmix64_rank(col("k")),
        small, splitmix64_rank(col("k")), nHashes = 5, mBits = 24)
      .count()
    println(f"BLOOM_20M_SEC=${(System.nanoTime() - t0) / 1e9}%.2f kept=$n")
    spark.stop()
  }
}
