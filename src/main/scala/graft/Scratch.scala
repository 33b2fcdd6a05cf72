package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway integration smoke for local dev (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"

    def audit(name: String): Unit = {
      println(s"======== $name")
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      plan.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") ||
          l.contains("Aggregate(") || l.contains("Scan parquet") ||
          l.contains("Window"))
        .take(24).foreach(l => println(l.take(150)))
    }
    Seq("q26_text_search", "q23_minhash_lsh", "q10_jaccard_pairs",
      "q29_filtered_knn").foreach(audit)
    spark.stop()
  }
}
