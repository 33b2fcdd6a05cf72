package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: times the four round-6 session-2 bench rows that the
  * budget skipped, in isolation. Not part of the product surface. */
object ScratchNewRows {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, Graph, GroupOps, LangModel}

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    time("NB_1M") {
      val docs = spark.range(1000000L).select(col("id"),
        concat(lit("l"), pmod(col("id"), lit(5))).as("label"),
        concat_ws(" ", (0 until 8).map(j =>
          concat(lit("w"), pmod(xxhash64(col("id"), lit(80 + j))
            + pmod(col("id"), lit(5)) * 7L, lit(5000L)))): _*).as("text"))
      val m = LangModel.naiveBayesFit(docs, col("label"), col("text"))
      LangModel.naiveBayesScore(docs, m, "id", col("text"))
        .agg(count(lit(1))).collect()
    }
    time("WALKS_1M") {
      val e = spark.range(1000000L).select(
        pmod(xxhash64(col("id"), lit(91)), lit(100000L)).as("src"),
        pmod(xxhash64(col("id"), lit(92)), lit(100000L)).as("dst"))
      val starts = spark.range(100000L).toDF("id")
      Graph.randomWalks(e, "src", "dst", starts, "id",
        walksPerNode = 2, walkLength = 4).agg(count(lit(1))).collect()
    }
    time("TE_10M") {
      val df = spark.range(10000000L).select(col("id"),
        concat(lit("c"), pmod(xxhash64(col("id"), lit(95)), lit(1000L))).as("cat"),
        pmod(xxhash64(col("id"), lit(96)), lit(1000L)).as("y"))
      GroupOps.targetEncode(df, "id", col("cat"), col("y"))
        .agg(count(lit(1)), sum("loo_num")).collect()
    }
    time("SCD_10M") {
      val snaps = spark.range(10000000L)
        .select((col("id") % 1000000L).as("sid"), (col("id") / 1000000L).as("v"))
        .where(pmod(col("sid") + col("v"), lit(11)) =!= 0)
        .select(col("sid").as("id"), col("v"),
          when(col("v") <= pmod(col("sid"), lit(10)), lit("a"))
            .otherwise(lit("b")).as("content"))
      Dedup.scdMerge(snaps, "id", col("v"), col("content"))
        .agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
