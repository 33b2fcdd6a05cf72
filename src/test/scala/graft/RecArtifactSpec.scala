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
