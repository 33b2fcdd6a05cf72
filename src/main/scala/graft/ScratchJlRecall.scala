package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScratchJlRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Ann, Knn}
    // clustered corpus: 1000 centers, per-point noise 1/8 of center spread
    def clustered(n: Long, seedBase: Int) = spark.range(n).select(
      col("id"),
      transform(sequence(lit(0), lit(127)), j =>
        ((pmod(xxhash64(pmod(col("id"), lit(1000)), j, lit(seedBase)), lit(10000)) / 10000.0)
          + (pmod(xxhash64(col("id"), j, lit(seedBase + 1)), lit(10000)) / 80000.0))
          .cast("float")).as("embedding"))
    val docs = clustered(1000000L, 7)
    docs.write.mode("overwrite").parquet("/tmp/jl_clustered")
    val stored = spark.read.parquet("/tmp/jl_clustered")
    val queries = clustered(1000000L, 7).where(pmod(col("id"), lit(9999)) === 3).limit(100)
      .select((col("id") + 2000000000L).as("id"), col("embedding"))
    val exact = Knn.bruteForce(stored, queries, 10, "cosine")
    exact.cache().count()
    for ((od, rr) <- Seq((16, 200), (64, 200), (64, 1000))) {
      val t0 = System.nanoTime()
      val r = Ann.recallAgainstExact(
        Ann.jlSearchRerank(stored, queries, 10, outDim = od, rerank = rr,
          queryId = "id"), exact)
      println(f"clustered outDim=$od rerank=$rr recall=${r}%.3f sec=${(System.nanoTime()-t0)/1e9}%.1f")
    }
  }
}
