package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: isolated re-measurement of the four r6 runs=1 rows that
  * regressed multi-× vs r5 with no code change (VERDICT r6 item 3) —
  * x_hilbert_write_4m (now codegen'd), x_gopher_1m, x_neardup_ingest_1m,
  * x_plsa_300k. Mirrors the Bench row bodies exactly. Not part of the
  * product surface. */
object ScratchRegressed {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.range(1000000).select(sum("id")).collect()

    val zsrc = spark.range(4000000L).select(
      col("id"),
      pmod(xxhash64(col("id"), lit(11)), lit(4096L)).as("a"),
      pmod(xxhash64(col("id"), lit(12)), lit(4096L)).as("b"),
      concat_ws("", transform(sequence(lit(0), lit(6)),
        j => hex(xxhash64(col("id"), j)))).as("payload"))
    time("x_hilbert_write_4m") {
      graft.operators.ZOrder.writeHilbertOrdered(zsrc,
        "/tmp/graft_scratch/hord", 64, 12, "a", "b")
    }

    time("x_gopher_1m") {
      val textDocs = spark.range(1000000L).select(
        concat_ws(" ", transform(sequence(lit(0), lit(19)),
          j => concat(lit("w"), pmod(xxhash64(col("id"), j), lit(50000)))))
          .as("text"))
      graft.operators.Quality.gopherQuality(textDocs, col("text"),
        minWords = 10, minDistinctStopwords = 0)
        .agg(sum(col("keep").cast("long"))).collect()
    }

    time("x_neardup_ingest_1m") {
      def mkText(n: Long, off: Long, mut: Boolean) =
        spark.range(n).select((col("id") + off).as("doc_id"),
          concat_ws(" ", transform(sequence(lit(0), lit(19)), j =>
            concat(lit("w"), pmod(xxhash64(
              when(lit(mut) && col("id") < 5000 && j === 0,
                col("id") + 7777777L)
                .otherwise(col("id") % 1000000), j), lit(50000)))))
            .as("text"))
      val corpus = Dedup.minhashSignatures(
        mkText(1000000L, 0L, mut = false), "doc_id", "text")
      val batch = Dedup.minhashSignatures(
        mkText(100000L, 2000000L, mut = true), "doc_id", "text")
      Dedup.minhashAgainstSigs(batch, corpus, threshold = 0.5).count()
    }

    time("x_plsa_300k") {
      val textDocs = spark.range(300000L).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(19)),
          j => concat(lit("w"), pmod(xxhash64(col("id"), j), lit(50000)))))
          .as("text"))
      val tok = textDocs.select(col("doc_id").as("d"),
          explode(split(col("text"), " ")).as("w"))
        .groupBy("d", "w").agg(count(lit(1)).as("c"))
      val m = graft.operators.Plsa.fit(tok, "d", "w", "c", k = 8, iters = 1)
      m.phi.agg(sum("p")).collect()
      m.theta.agg(sum("t")).collect()
    }
  }
}
