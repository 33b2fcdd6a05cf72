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

    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 100)

    val t0 = System.nanoTime()
    val exact = Knn.bruteForce(emb, queries, 10, "cosine",
      docId = "vec_id", queryId = "vec_id", excludeSelf = true).cache()
    println(s"EXACT_ROWS=${exact.count()} in ${(System.nanoTime()-t0)/1e9}s")

    val t1 = System.nanoTime()
    val idx = Ann.ivfBuild(emb, "vec_id", "embedding", nCells = 16)
    idx.assigned.cache().count()
    println(s"IVF_BUILD=${(System.nanoTime()-t1)/1e9}s")

    for (nProbe <- Seq(2, 4, 8)) {
      val t2 = System.nanoTime()
      val approx = Ann.ivfSearch(idx, queries, 10,
        queryId = "vec_id", queryVec = "embedding", nProbe = nProbe)
        .where(col("id") =!= col("query_id"))
      val r = Ann.recallAgainstExact(approx, exact)
      println(f"IVF_RECALL nProbe=$nProbe recall=$r%.3f time=${(System.nanoTime()-t2)/1e9}%.2fs")
    }
    spark.stop()
  }
}
