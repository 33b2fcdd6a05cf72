package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Throwaway integration smoke for local dev (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // driver t1 smoke: entry() on sf0.001, rows > 0
    val e = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + e.count())
    e.show(3, 60)

    // probe: malformed filter JSON → clean error?
    try {
      Filters.where(spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
        """{"l_quantity":{"$bogus":1}}""").count()
      println("PROBE_BAD_OP=no-error!")
    } catch { case ex: Exception => println("PROBE_BAD_OP=" + ex.getMessage.take(80)) }

    try {
      Filters.where(spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
        """{"no_such_col":{"$gte":1}}""").count()
      println("PROBE_BAD_COL=no-error!")
    } catch { case ex: Exception => println("PROBE_BAD_COL=" + ex.getMessage.take(80)) }

    // probe: knn k larger than doc count
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val big = Knn.bruteForce(emb, emb.limit(2), 10000, "cosine",
      docId = "vec_id", queryId = "vec_id")
    println("PROBE_BIG_K_ROWS=" + big.count())

    spark.stop()
  }
}
