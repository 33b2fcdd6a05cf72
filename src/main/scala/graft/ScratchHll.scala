package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: isolate x_hll_20m's cost — hash, rho, registers, dense. */
object ScratchHll {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def toks = spark.range(1000000L).select(
      pmod(col("id"), lit(16)).as("g"),
      explode(transform(sequence(lit(0), lit(19)),
        j => concat(lit("w"), pmod(xxhash64(col("id"), j), lit(50000)))))
        .as("w"))
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm
    toks.agg(count(lit(1))).collect()
    time("hash only") {
      toks.select(graft.operators.Sketch.keyHash(col("w"))
          .bitwiseAND(lit(255L)).as("h"))
        .agg(sum("h")).collect()
    }
    time("hash+bucket+rho agg") {
      val h = graft.operators.Sketch.keyHash(col("w"))
      toks.select(col("g"),
          graft.operators.Sketch.hllBucket(h, 8).as("b"),
          graft.operators.Sketch.hllRho(h, 8).as("r"))
        .groupBy("g", "b").agg(max("r")).agg(count(lit(1))).collect()
    }
    time("hllRegisters p=12") {
      graft.operators.Sketch.hllRegisters(
        toks, Seq("g"), graft.operators.Sketch.keyHash(col("w")), 12)
        .agg(count(lit(1))).collect()
    }
    time("hllSketch dense p=12") {
      graft.operators.Sketch.hllSketch(
        toks, Seq("g"), graft.operators.Sketch.keyHash(col("w")), 12)
        .select(size(col("hll"))).collect()
    }
    time("full hllDistinctStrings") {
      graft.operators.Sketch.hllDistinctStrings(
        toks, Seq("g"), col("w"), p = 12).collect()
    }
    time("kmv k=1024 (comparison)") {
      graft.operators.Sketch.kmvDistinctStrings(
        toks, Seq("g"), col("w"), k = 1024).collect()
    }
    spark.stop()
  }
}
