package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: the four round-7 bench rows in isolation. */
object ScratchR7Rows {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.range(1000000).select(sum("id")).collect()

    time("x_sessionize_10m") {
      import graft.operators.Funnel
      val ev = spark.range(10000000L).select(
        pmod(xxhash64(col("id"), lit(71)), lit(1000000L)).as("u"),
        pmod(xxhash64(col("id"), lit(72)), lit(86400000000000L)).as("ts"),
        concat(lit("t"), pmod(col("id"), lit(5))).as("t"))
      Funnel.sessionize(ev, "u", "ts", "t", gapNs = 600000000000L)
        .agg(count(lit(1)), sum("n_events")).collect()
    }
    time("x_spellcorrect_1m") {
      import graft.operators.TextSearch
      def word(c: org.apache.spark.sql.Column, seed: Int) =
        concat_ws("", transform(sequence(lit(0), lit(6)), j =>
          chr(lit(97) + pmod(xxhash64(c, j, lit(seed)), lit(26)))))
      val vocab = spark.range(100000L)
        .select(word(col("id"), 1).as("word"),
          pmod(xxhash64(col("id"), lit(2)), lit(10000L)).as("freq"))
      val toks = spark.range(1000000L)
        .select(concat(substring(word(pmod(col("id"), lit(100000L)), 1),
          1, 6)).as("tok"))
      TextSearch.spellCorrect(toks, "tok", vocab, "word", "freq")
        .agg(count(lit(1))).collect()
    }
    time("x_featsmooth_1m") {
      import graft.operators.Graph
      val edges = spark.range(4000000L).select(
        pmod(xxhash64(col("id"), lit(81)), lit(1000000L)).as("a"),
        pmod(xxhash64(col("id"), lit(82)), lit(1000000L)).as("b"))
      val feats = spark.range(1000000L).select(col("id"),
        (pmod(xxhash64(col("id"), lit(83)), lit(1000L)) * 1000L).as("f"))
      Graph.featureSmoothPpm(edges, feats, "id", col("f"), rounds = 2)
        .agg(sum("x_ppm")).collect()
    }
    time("x_isotonic_10m") {
      import graft.operators.Evaluate
      val df = spark.range(10000000L).select(
        (pmod(xxhash64(col("id"), lit(61)), lit(200L)) / 200.0).as("s"),
        (pmod(xxhash64(col("id"), lit(62)), lit(1000L)) <
          pmod(xxhash64(col("id"), lit(61)), lit(200L)) * 4 + 100).as("y"))
      Evaluate.isotonicFit(df, col("s"), col("y"), quantScale = 200L)
        .agg(count(lit(1)), sum("fit_den")).collect()
    }
  }
}
