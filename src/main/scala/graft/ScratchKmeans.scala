package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway local dev harness (not part of the contract): times the
  * x_kmeans_1m bench row in isolation (1M×128, k=16, 2 Lloyd iterations)
  * to validate the map-only nearest-centroid assign kernel. */
object ScratchKmeans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graftkm").toString
    Bench.benchDocs(spark, 1000000L, 128)
      .write.mode("overwrite").option("compression", "none")
      .parquet(s"$tmp/docs1m")
    val stored = spark.read.parquet(s"$tmp/docs1m")
    stored.count() // warm FS cache like the bench sequence does

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // phase profile
    val vppm = transform(col("embedding").cast("array<double>"),
      x => round(x * 1e6).cast("long"))
    val base = stored.withColumn("_vppm", vppm)
    t("scan_vppm_only") {
      base.select(sum(element_at(col("_vppm"), 1))).collect()
    }
    t("posexplode_agg") {
      base.withColumn("_cell", pmod(xxhash64(col("id"), lit(42L)), lit(16)).cast("int"))
        .select(col("_cell"), posexplode(col("_vppm")).as(Seq("_pos", "_x")))
        .groupBy("_cell", "_pos")
        .agg(sum("_x"), count(lit(1))).collect()
    }
    val cents = (0 until 16).map(c => (0 until 128).map(_ => c * 0.01)).toSeq
    t("assign_kernel_only") {
      stored.withColumn("_cell",
          graft.functions.nearest_centroid(col("embedding"), 0 until 16, cents))
        .agg(sum("_cell")).collect()
    }
    t("x_kmeans_1m") {
      operators.Ann.kmeansLloyd(stored, "id", "embedding", k = 16, iters = 2)
        .assigned.agg(sum("_cell")).collect()
    }
    spark.stop()
  }
}
