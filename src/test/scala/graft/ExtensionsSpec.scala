package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Summary

class ExtensionsSpec extends SparkSuite {
  import spark.implicits._

  test("registerAll makes native functions callable from SQL") {
    graft.functions.registerAll(spark)
    val r = spark.sql(
      """SELECT cosine_distance(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS d,
                simhash64(array('a','b')) AS s,
                l2_normalize(array(3.0d, 4.0d)) AS n""").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getSeq[Double](2).zip(Seq(0.6, 0.8))
      .forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("topk_by_distance usable as SQL aggregate") {
    graft.functions.registerAll(spark)
    spark.range(100).createOrReplaceTempView("xs")
    val r = spark.sql(
      """SELECT topk_by_distance(cast(id AS double), id, 3) AS top
         FROM xs""").collect()(0)
    val top = r.getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
  }

  test("GraftExtensions injects functions at session build time") {
    // getOrCreate returns the suite session and would skip extensions;
    // clear default/active so a fresh session (same context) is built
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT size(text_ngrams('a b c', 2)) AS n, fnv64('x') AS h").collect()(0)
      assert(r.getInt(0) == 2)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("Summary.describe reports fill ratios and stats") {
    val df = Seq((1L, "ab", Seq(1.0f)), (2L, null.asInstanceOf[String], Seq(1.0f, 2.0f)))
      .toDF("id", "text", "embedding")
    val s = Summary.describe(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(s("id").getLong(2) == 2)
    assert(s("text").getDouble(3) == 0.5)
    assert(s("embedding").getDouble(6) == 1.5)
  }
}
