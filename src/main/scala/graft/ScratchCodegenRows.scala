package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: isolated min-of-2 for the bench rows whose scan
  * expressions were converted from CodegenFallback to doGenCode in r8
  * (bpe/wordpiece/unigram encode, feature-hash text→tensor, sq/pq
  * encode, spell-correct's damerau path) — mirrors the Bench bodies. */
object ScratchCodegenRows {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions._

    def time(name: String, runs: Int = 2)(f: => Unit): Unit = {
      var best = Double.MaxValue
      var i = 0
      while (i < runs) {
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        i += 1
      }
      println(f"$name=$best%.2f")
    }
    spark.range(1000000).select(sum("id")).collect()

    val textDocs = spark.range(1000000L).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(19)),
        j => concat(lit("w"), pmod(xxhash64(col("id"), j), lit(50000)))))
        .as("text")).cache()
    textDocs.count()

    val merges = graft.operators.Bpe.train(
      textDocs.limit(10000), col("text"), numMerges = 100)
    time("x_bpe_encode_1m") {
      textDocs.select(bpe_encode(col("text"), merges).as("toks"))
        .agg(sum(size(col("toks")))).collect()
    }

    time("x_text_tensor_1m") {
      textDocs.select(feature_hash(
          split(col("text"), " "), 128).as("v"))
        .agg(sum(element_at(col("v"), 1))).collect()
    }

    time("x_fingerprint_1m") {
      textDocs.select(rolling_fingerprint(col("text"), 16).as("f"))
        .agg(sum(pmod(col("f"), lit(1000000L)))).collect()
    }

    time("x_minhash_sig_1m") {
      textDocs.select(minhash_text(col("text"), 2, 64).as("s"))
        .agg(sum(pmod(element_at(col("s"), 1), lit(1000000L)))).collect()
    }

    val emb = spark.range(1000000L).select(col("id"),
      transform(sequence(lit(0), lit(127)),
        j => (pmod(xxhash64(col("id"), j), lit(10000)) / 10000.0)
          .cast("float")).as("embedding")).cache()
    emb.count()
    val mins = Seq.fill(128)(0.0)
    val deltas = Seq.fill(128)(1.0 / 255)
    time("ann_sq_encode_1m") {
      emb.select(sq_encode(col("embedding"), mins, deltas).as("c"))
        .agg(sum(length(col("c")))).collect()
    }

    textDocs.unpersist(); emb.unpersist()
    spark.stop()
  }
}
