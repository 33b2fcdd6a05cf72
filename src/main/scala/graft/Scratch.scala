package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._
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
    val dir = "/root/testdata/sf0.001"

    // 1. ns-timestamp parquet read (as long nanos)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$dir/events.parquet")
    events.printSchema()
    events.select(col("ts"), (col("ts") / lit(3600000000000L)).cast("long").as("hour_bucket")).show(3, false)

    // 2. expression bridge + distance expr
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.select(cosine_distance(col("embedding"), col("embedding")).as("d0"),
      fnv64(lit("hello")).as("h")).show(3)

    // 3. knn end-to-end with topk aggregate
    val q = emb.where(col("vec_id") < 3)
    val knn = Knn.bruteForce(emb, q, 5, "cosine",
      docId = "vec_id", queryId = "vec_id", excludeSelf = true)
    knn.orderBy("query_id", "rank").show(20, false)

    // 4. filter DSL
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    println("filter count: " + Filters.where(li,
      """{"$and":[{"l_quantity":{"$gte":45}},{"l_returnflag":{"$in":["A","R"]}}]}""").count())
    println("placeholder: " + Filters.where(li,
      """{"l_discount":{"$gt":"{l_tax}"}}""").count())

    // 5. dedup ops smoke
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println("jaccard pairs>=0.3: " +
      Dedup.jaccardPairs(docs, "doc_id", "text", 0.3).count())
    Dedup.minhashLsh(docs, "doc_id", "text", 0.3, 64, 16, 1).show(5)
    println("simhash pairs: " + Dedup.simhashPairs(docs, "doc_id", "text", 10).count())

    spark.stop()
  }
}
