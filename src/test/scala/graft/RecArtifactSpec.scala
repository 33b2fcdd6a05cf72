package graft

import org.apache.spark.sql.functions._

import graft.operators.Recommend

/** r7 additions: the persistable co-count model behind itemItemRecs —
  * merge losslessness, artifact-serving parity, plan-shape locks. */
class RecArtifactSpec extends SparkSuite {
  import spark.implicits._

  private def interactions(users: Range) = users.flatMap { u =>
    (0 until 3 + u % 4).map(j => (u.toLong, s"i${(u * 7 + j * 13) % 40}"))
  }.toDF("u", "i")

  test("coCounts: merge of user-disjoint halves == one-shot, exactly") {
    val all = interactions(0 until 200)
    val full = Recommend.coCounts(all, "u", "i")
    val merged = Recommend.coCountsMerge(
      Recommend.coCounts(all.where(col("u") < 100), "u", "i"),
      Recommend.coCounts(all.where(col("u") >= 100), "u", "i"))
    assert(full.collect().map(_.toSeq).toSet ==
      merged.collect().map(_.toSeq).toSet)
  }

  test("itemItemRecsFromCounts: artifact serving == direct recs") {
    val all = interactions(0 until 150)
    val direct = Recommend.itemItemRecs(all, "u", "i",
      topN = 5, minSupport = 2L, simTopK = 10)
    val served = Recommend.itemItemRecsFromCounts(
      Recommend.coCounts(all, "u", "i"), all, "u", "i",
      topN = 5, minSupport = 2L, simTopK = 10)
    assert(direct.collect().map(_.toSeq).toSet ==
      served.collect().map(_.toSeq).toSet)
  }

  test("coCounts: parquet round-trip serves identically (null-b rows)") {
    val all = interactions(0 until 80)
    val dir = java.nio.file.Files.createTempDirectory("graftcc").toString
    Recommend.coCounts(all, "u", "i").write.mode("overwrite")
      .parquet(s"$dir/counts")
    val served = Recommend.itemItemRecsFromCounts(
      spark.read.parquet(s"$dir/counts"), all, "u", "i",
      topN = 5, minSupport = 2L, simTopK = 10)
    val direct = Recommend.itemItemRecs(all, "u", "i",
      topN = 5, minSupport = 2L, simTopK = 10)
    assert(served.collect().map(_.toSeq).toSet ==
      direct.collect().map(_.toSeq).toSet)
  }

  test("streamingCoCounts: user-disjoint batches merge to the one-shot model") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.EventStream
    val all = interactions(0 until 120)
    val h1 = interactions(0 until 60).as[(Long, String)].collect()
    val h2 = interactions(60 until 120).as[(Long, String)].collect()
    val dir = java.nio.file.Files.createTempDirectory("graftscc").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val writer = EventStream.streamingCoCounts(
        mem.toDF().toDF("u", "i"), "u", "i", path = s"$dir/state")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/_chk")
    mem.addData(h1: _*)
    val r1 = writer.start(); r1.processAllAvailable(); r1.stop()
    mem.addData(h2: _*)
    val r2 = writer.start(); r2.processAllAvailable(); r2.stop()
    val live = EventStream.readCoCounts(spark, s"$dir/state")
    val oneShot = Recommend.coCounts(all, "u", "i")
    assert(live.collect().map(_.toSeq).toSet ==
      oneShot.collect().map(_.toSeq).toSet)
  }

  test("coverageReport: hand coverage and concentration") {
    // recs: i1 x3, i2 x1 over catalog {i1..i8}: coverage 250000 ppm;
    // gini over (1, 3): rx = 1*1 + 2*3 = 7, num = 14 - 3*4 = 2.
    val recs = Seq((1L, "i1"), (2L, "i1"), (3L, "i1"), (3L, "i2"))
      .toDF("user", "item")
    val cat = (1 to 8).map(i => s"i$i").toDF("item")
    val r = Recommend.coverageReport(recs, cat).collect().head
    assert(r.getAs[Long]("n_catalog") == 8L)
    assert(r.getAs[Long]("n_recommended") == 2L)
    assert(r.getAs[Long]("coverage_ppm") == 250000L)
    assert(r.getAs[Long]("gini_num") == 2L)
    assert(math.abs(r.getAs[Double]("gini") - 2.0 / 8) < 1e-12)
  }

  test("plan locks: no cartesian/nested-loop in the recommender plans") {
    val all = interactions(0 until 50)
    val p1 = Recommend.itemItemRecs(all, "u", "i")
      .queryExecution.executedPlan.toString
    assert(!p1.contains("CartesianProduct") &&
      !p1.contains("BroadcastNestedLoop"))
    val p2 = Recommend.nextItemRecs(all, "u", "i", monotonically_increasing_id())
      .queryExecution.executedPlan.toString
    assert(!p2.contains("CartesianProduct") &&
      !p2.contains("BroadcastNestedLoop"))
    // hitRate's summary row assembles via broadcast 1-row crossJoins
    // (the house convention) — only a true cartesian is forbidden
    val p3 = Recommend.hitRateAtN(
        all.withColumn("o", col("u") * 100), "u", "i", col("o"))
      .queryExecution.executedPlan.toString
    assert(!p3.contains("CartesianProduct"))
  }
}
