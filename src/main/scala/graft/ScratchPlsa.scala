package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: hilbert vs zorder 4M write parity in one session. */
object ScratchPlsa {
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
    val zsrc = spark.range(4000000L).select(
      col("id"),
      pmod(xxhash64(col("id"), lit(11)), lit(4096L)).as("a"),
      pmod(xxhash64(col("id"), lit(12)), lit(4096L)).as("b"),
      concat_ws("", transform(sequence(lit(0), lit(6)),
        j => hex(xxhash64(col("id"), j)))).as("payload"))
    time("zorder_write_4m") {
      graft.operators.ZOrder.writeZOrdered(zsrc,
        "/tmp/graft_scratch/zord", 64, 12, "a", "b")
    }
    time("hilbert_write_4m") {
      graft.operators.ZOrder.writeHilbertOrdered(zsrc,
        "/tmp/graft_scratch/hord", 64, 12, "a", "b")
    }
    time("zorder_write_4m_b") {
      graft.operators.ZOrder.writeZOrdered(zsrc,
        "/tmp/graft_scratch/zord", 64, 12, "a", "b")
    }
    time("hilbert_write_4m_b") {
      graft.operators.ZOrder.writeHilbertOrdered(zsrc,
        "/tmp/graft_scratch/hord", 64, 12, "a", "b")
    }
  }
}
