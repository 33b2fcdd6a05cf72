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
        .filter(l => l.contains("PushedFilters") || l.contains("Exchange") ||
          l.contains("Join") || l.contains("WholeStageCodegen") ||
          l.contains("Scan") || l.contains("Aggregate") || l.contains("Window"))
        .take(18).foreach(l => println(l.take(220)))
    }
    Seq("q01_pricing_agg", "q02_filter_mongo", "q03_top_customers",
      "q04_supplier_top_parts", "q11_knn_cosine", "q16_sessions").foreach(audit)
    spark.stop()
  }
}
