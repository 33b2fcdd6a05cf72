package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.schema.DocSchema
import graft.sources.BinaryCodec

/** DataSource V2 connector for the reference binary stream format:
  * spark.read/write.format("graft-docbin"). */
class DocBinSourceSpec extends SparkSuite {
  import spark.implicits._

  private def flatDocs(n: Int) = {
    val df = (0 until n).map { i =>
      (s"doc$i", s"text payload $i", Seq(i.toFloat, (i * 2).toFloat))
    }.toDF("id", "text", "embedding")
    DocSchema.fromColumns(df)
  }

  test("write + read round-trip through the V2 connector") {
    val dir = Files.createTempDirectory("docbin_v2").toString
    flatDocs(37).repartition(4).write.format("graft-docbin")
      .mode("overwrite").save(dir)
    val back = spark.read.format("graft-docbin").load(dir)
    assert(back.count() == 37)
    val got = back.select("id", "text", "embedding")
      .as[(String, String, Seq[Float])].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (0 until 37).map(i => s"doc$i").sorted)
    val d5 = got.find(_._1 == "doc5").get
    assert(d5._2 == "text payload 5" && d5._3 == Seq(5.0f, 10.0f))
  }

  test("writer shards are valid reference streams; reader parallelizes per file") {
    val dir = Files.createTempDirectory("docbin_shards").toString
    flatDocs(20).repartition(3).write.format("graft-docbin")
      .mode("overwrite").save(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".protobuf"))
    assert(files.length == 3)
    // each shard independently parses with the driver-side codec
    val total = files.map(f =>
      BinaryCodec.loadBinary(spark, f.getPath).count()).sum
    assert(total == 20)
    // one input partition per shard file
    val parts = spark.read.format("graft-docbin").load(dir).rdd.getNumPartitions
    assert(parts == 3)
  }

  test("interop: saveBinaryShards output is readable by the connector") {
    val dir = Files.createTempDirectory("docbin_interop").toString + "/shards"
    BinaryCodec.saveBinaryShards(flatDocs(11).repartition(2), dir)
    val back = spark.read.format("graft-docbin").load(dir)
    assert(back.count() == 11)
    assert(back.select("id").as[String].collect().toSet ==
      (0 until 11).map(i => s"doc$i").toSet)
  }

  test("column pruning reaches the scan (ReadSchema subset)") {
    val dir = Files.createTempDirectory("docbin_prune").toString
    flatDocs(5).coalesce(1).write.format("graft-docbin")
      .mode("overwrite").save(dir)
    val q = spark.read.format("graft-docbin").load(dir).select("id", "text")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") || q.schema.fieldNames.sameElements(Array("id", "text")))
    assert(q.as[(String, String)].collect().length == 5)
  }

  test("overwrite truncates previous shards") {
    val dir = Files.createTempDirectory("docbin_trunc").toString
    flatDocs(30).repartition(5).write.format("graft-docbin")
      .mode("overwrite").save(dir)
    flatDocs(4).coalesce(1).write.format("graft-docbin")
      .mode("overwrite").save(dir)
    assert(spark.read.format("graft-docbin").load(dir).count() == 4)
  }

  test("append adds shards without clobbering") {
    val dir = Files.createTempDirectory("docbin_append").toString
    flatDocs(6).coalesce(1).write.format("graft-docbin")
      .mode("overwrite").save(dir)
    flatDocs(6).coalesce(1).write.format("graft-docbin")
      .mode("append").save(dir)
    assert(spark.read.format("graft-docbin").load(dir).count() == 12)
  }

  test("failed overwrite job leaves prior data intact (job-level atomicity)") {
    val dir = Files.createTempDirectory("docbin_atomic").toString
    flatDocs(9).repartition(3).write.format("graft-docbin")
      .mode("overwrite").save(dir)
    // a write whose tasks throw mid-stream: the truncate must NOT have
    // happened (it runs only in BatchWrite.commit, after all staging)
    val poisoned = DocSchema.fromColumns(
      (0 until 8).map(i => (s"p$i", s"t$i")).toDF("id", "text")
        .withColumn("id",
          when(col("id") === "p5", raise_error(lit("boom")))
            .otherwise(col("id"))))
    intercept[Exception] {
      poisoned.repartition(2).write.format("graft-docbin")
        .mode("overwrite").save(dir)
    }
    val back = spark.read.format("graft-docbin").load(dir)
    assert(back.count() == 9, "old shards must survive a failed overwrite")
    // abort cleaned the staging namespace
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("_staging-")))
  }
}
