package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: isolated x_cc_incr_1m probe (fold 10k pairs into a 1M
  * cached assignment) — backs the O(affected) claim in NOTES. */
object ScratchCcIncr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    spark.range(1000000).select(sum("id")).collect()
    val nodes = spark.range(1000000L).select(col("id"))
    val chain = spark.range(1000000L)
      .where(pmod(col("id"), lit(10)) =!= 9 && col("id") < 999000L)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val long0 = spark.range(999L)
      .select((col("id") + 999000L).as("a"), (col("id") + 999001L).as("b"))
    val t0 = System.nanoTime()
    val asg = Dedup.clusters(chain.unionByName(long0), nodes, "id").cache()
    asg.count()
    println(f"full_build=${(System.nanoTime()-t0)/1e9}%.2f")
    var best = Double.MaxValue
    for (_ <- 0 until 2) {
      val t1 = System.nanoTime()
      val newPairs = spark.range(10000L)
        .select((col("id") + 1000000L).as("a"), (col("id") * 100L).as("b"))
      val newNodes = spark.range(10000L).select((col("id") + 1000000L).as("id"))
      val r = Dedup.clustersIncremental(asg, newPairs, newNodes, "id")
        .agg(countDistinct(col("cluster_id"))).collect()
      best = math.min(best, (System.nanoTime()-t1)/1e9)
      println("clusters=" + r(0).getLong(0))
    }
    println(f"x_cc_incr_1m=$best%.2f")
    spark.stop()
  }
}
