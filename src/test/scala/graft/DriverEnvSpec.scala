package graft

import org.apache.spark.sql.SparkSession

/** Harness-faithfulness: SparkEntry queries must work on a session built
  * with Spark DEFAULTS (200 shuffle partitions, no graft extensions, no
  * preset timezone/conf) — the shape of a driver-owned session. */
class DriverEnvSpec extends SparkSuite {

  test("queries run on a default-config session") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // fresh session state over the shared context (context-level confs
      // like shuffle partitions persist; session confs reset)
      val vanilla = SparkSession.builder().master("local[4]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      vanilla.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      vanilla.conf.set("spark.sql.session.timeZone",
        java.util.TimeZone.getDefault.getID)
      val dir = "/root/testdata/sf0.001"
      for (q <- Seq("q01_pricing_agg", "q11_knn_cosine", "q15_events_hourly",
          "q02_filter_mongo", "q23_minhash_lsh")) {
        assert(SparkEntry.queries(q)(vanilla, dir).count() >= 0, q)
      }
      assert(SparkEntry.entry(vanilla).count() > 0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
