package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: the three JL bench rows in isolation, after the r7 plan
  * fixes (precomputed sign matrix → SignProjectLong codegen kernel;
  * rerank routed through the blocked sketch-knn kernel; default
  * outDim 16 → 64 for usable recall). Not part of the product surface. */
object ScratchJl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Ann, Knn}

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    val docs = Bench.benchDocs(spark, 1000000L, 128)
    val dir = "/tmp/jl_bench_docs"
    docs.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val queries100 = Bench.benchDocs(spark, 100, 128)

    // warmup
    spark.range(1000000).select(sum("id")).collect()

    time("x_jl_project_1m") {
      Ann.jlProject(stored, "id", "embedding", outDim = 16)
        .write.format("noop").mode("overwrite").save()
    }
    time("x_jl_rerank100_run1") {
      Ann.jlSearchRerank(stored, queries100, 10, rerank = 200).count()
    }
    time("x_jl_rerank100_run2") {
      Ann.jlSearchRerank(stored, queries100, 10, rerank = 200).count()
    }
    val exact = Knn.bruteForce(stored, queries100, 10, "cosine")
    println("x_jl_recall10_x1000=" + math.round(Ann.recallAgainstExact(
      Ann.jlSearchRerank(stored, queries100, 10, rerank = 200),
      exact) * 1000))
  }
}
