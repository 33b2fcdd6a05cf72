package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: isolated x_neardup_ingest_1m after the window-valve
  * rewrite of minhashAgainstSigs. */
object ScratchNeardup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    def time(name: String, runs: Int = 2)(f: => Unit): Unit = {
      var best = Double.MaxValue
      for (_ <- 0 until runs) {
        val t0 = System.nanoTime(); f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$name=$best%.2f")
    }
    spark.range(1000000).select(sum("id")).collect()
    def mkText(n: Long, off: Long, mut: Boolean) =
      spark.range(n).select((col("id") + off).as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(19)), j =>
          concat(lit("w"), pmod(xxhash64(
            when(lit(mut) && col("id") < 5000 && j === 0,
              col("id") + 7777777L)
              .otherwise(col("id") % 1000000), j), lit(50000)))))
          .as("text"))
    time("x_neardup_ingest_1m") {
      val corpus = Dedup.minhashSignatures(
        mkText(1000000L, 0L, mut = false), "doc_id", "text")
      val batch = Dedup.minhashSignatures(
        mkText(100000L, 2000000L, mut = true), "doc_id", "text")
      val n = Dedup.minhashAgainstSigs(batch, corpus, threshold = 0.5).count()
      println(s"pairs=$n")
    }
    spark.stop()
  }
}
