package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling for local dev (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $name -> $r in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val docs = Bench.benchDocs(spark, 1000000L, 128)
    time("gen_only") {
      docs.select(sum(element_at(col("embedding"), 1))).collect()(0)
    }
    time("write_snappy") {
      docs.write.mode("overwrite").parquet("/tmp/prof/snappy")
    }
    time("write_uncompressed") {
      docs.write.mode("overwrite").option("compression", "none")
        .parquet("/tmp/prof/none")
    }
    spark.stop()
  }
}
