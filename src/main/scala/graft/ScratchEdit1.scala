package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: the x_edit1_pairs_1m bench row in isolation. */
object ScratchEdit1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    spark.range(1000000).select(sum("id")).collect()
    def code(c: org.apache.spark.sql.Column, seed: Int) =
      concat_ws("", transform(sequence(lit(0), lit(6)), j =>
        chr(lit(97) + pmod(xxhash64(c, j, lit(seed)), lit(26)))))
    val df = spark.range(1000000L).select(col("id"),
      when(pmod(col("id"), lit(10)) === 0,
        concat(
          substring(code(pmod(col("id"), lit(100000L)), 5), 1, 3),
          substring(code(pmod(col("id"), lit(100000L)), 5), 5, 3)))
        .otherwise(code(pmod(col("id"), lit(100000L)), 5)).as("s"))
    val t0 = System.nanoTime()
    val n = Dedup.delete1Pairs(df, "id", "s", maxBucket = 1000000)
      .agg(count(lit(1))).head.getLong(0)
    println(f"x_edit1_pairs_1m=${(System.nanoTime() - t0) / 1e9}%.2f pairs=$n")
  }
}
