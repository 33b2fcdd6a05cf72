package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Throwaway integration smoke for local dev (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.minPartitionNum", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(s"$name -> $r in ${(System.nanoTime() - t0) / 1e9}s")
    }

    time("fused_sig_count") {
      docs.select(minhash_text(col("text"), 2, 128)).count()
    }
    time("shingle_sets_count") {
      docs.select(array_distinct(TextFunctions.wordNgrams(col("text"), 2))).count()
    }
    locally {
      import org.apache.spark.sql.functions._
      val sigs = docs.select(col("doc_id").as("_id"), minhash_text(col("text"), 2, 128, 42L).as("_sig"))
      val banded = sigs.select(col("_id"), posexplode(transform(sequence(lit(0), lit(31), lit(1)),
        b => xxhash64(lit(42L), b, slice(col("_sig"), b * 4 + 1, lit(4))))).as(Seq("_band", "_bucket")))
      val cand = banded.groupBy("_band", "_bucket").agg(collect_list("_id").as("_ids"))
        .where(size(col("_ids")) > 1)
        .select(explode(flatten(transform(col("_ids"), (x, i) =>
          transform(slice(col("_ids"), i + 2, size(col("_ids"))), y =>
            struct(least(x, y).as("a"), greatest(x, y).as("b")))))).as("_p"))
        .select(col("_p.a").as("a"), col("_p.b").as("b")).dropDuplicates("a", "b")
      time("banded_count") { banded.count() }
      val candC = cand.cache()
      time("cand_count") { candC.count() }
      val sets = docs.select(col("doc_id").as("_id"), array_distinct(TextFunctions.wordNgrams(col("text"), 2)).as("_sh"))
      val setsC = sets.repartition(32).cache()
      time("sets_count") { setsC.count() }
      val verified = candC
        .join(setsC.withColumnRenamed("_id", "a").withColumnRenamed("_sh", "_sha"), "a")
        .join(setsC.withColumnRenamed("_id", "b").withColumnRenamed("_sh", "_shb"), "b")
        .withColumn("_inter", size(array_intersect(col("_sha"), col("_shb"))))
        .withColumn("jaccard", col("_inter").cast("double") / (size(col("_sha")) + size(col("_shb")) - col("_inter")))
        .where(col("jaccard") >= 0.2)
      time("verify_count") { verified.count() }
      println(verified.queryExecution.executedPlan.toString.take(4000))
    }
    time("full_minhashLsh") {
      Dedup.minhashLsh(docs, "doc_id", "text", 0.2, 128, 32, 2).count()
    }
    time("full_minhashLsh_again") {
      Dedup.minhashLsh(docs, "doc_id", "text", 0.2, 128, 32, 2).count()
    }
    spark.stop()
  }
}
