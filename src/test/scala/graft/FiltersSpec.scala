package graft

import org.apache.spark.sql.functions._
import graft.operators.Filters

/** Filter-DSL semantics mirroring the reference's lookup tests
  * (reference: tests/unit/array/test_lookup.py, test_queryset.py). */
class FiltersSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 10, "hello world", Map("i" -> "1", "name" -> "x"), Seq(1.0f, 2.0f)),
    ("b", 20, "Spark rules", Map("i" -> "2", "name" -> "y"), Seq.empty[Float]),
    ("c", 30, "", Map.empty[String, String], Seq(3.0f)),
    ("d", 40, "hello spark", Map("i" -> "10"), null)
  ).toDF("id", "num", "text", "tags", "embedding")

  private def ids(json: String): Seq[String] =
    Filters.where(df, json).select("id").as[String].collect().toSeq.sorted

  test("$eq implicit and explicit") {
    assert(ids("""{"num": 20}""") == Seq("b"))
    assert(ids("""{"num": {"$eq": 20}}""") == Seq("b"))
  }

  test("comparisons and sibling-AND") {
    assert(ids("""{"num": {"$gt": 10, "$lte": 30}}""") == Seq("b", "c"))
    assert(ids("""{"num": {"$gte": 20}, "text": {"$contains": "Spark"}}""") == Seq("b"))
  }

  test("$in / $nin") {
    assert(ids("""{"id": {"$in": ["a", "c"]}}""") == Seq("a", "c"))
    assert(ids("""{"id": {"$nin": ["a", "c"]}}""") == Seq("b", "d"))
  }

  test("$or / $and / $not nesting") {
    assert(ids("""{"$or": [{"num": 10}, {"num": 40}]}""") == Seq("a", "d"))
    assert(ids("""{"$not": {"num": {"$lt": 40}}}""") == Seq("d"))
    assert(ids("""{"$and": [{"num": {"$gte": 10}}, {"$or": [{"id": "a"}, {"id": "b"}]}]}""")
      == Seq("a", "b"))
  }

  test("$regex and case-insensitive string ops") {
    assert(ids("""{"text": {"$regex": "^hello"}}""") == Seq("a", "d"))
    assert(ids("""{"text": {"$icontains": "SPARK"}}""") == Seq("b", "d"))
    assert(ids("""{"text": {"$startswith": "hello"}}""") == Seq("a", "d"))
  }

  test("tags dunder paths with numeric coercion") {
    // tags values are strings; numeric literal must compare numerically
    assert(ids("""{"tags__i": {"$gte": 2}}""") == Seq("b", "d"))
    assert(ids("""{"tags__name": {"$eq": "x"}}""") == Seq("a"))
  }

  test("$exists: default value counts as missing (lookup.py:108-124)") {
    assert(ids("""{"text": {"$exists": true}}""") == Seq("a", "b", "d"))
    assert(ids("""{"text": {"$exists": false}}""") == Seq("c"))
    assert(ids("""{"embedding": {"$exists": true}}""") == Seq("a", "c"))
    assert(ids("""{"tags__name": {"$exists": true}}""") == Seq("a", "b"))
  }

  test("$size") {
    assert(ids("""{"embedding": {"$size": 1}}""") == Seq("c"))
    assert(ids("""{"tags": {"$size": 0}}""") == Seq("c"))
  }

  test("placeholder compares to another field") {
    val d2 = Seq(("a", 1, 2), ("b", 5, 3)).toDF("id", "x", "y")
    val got = Filters.where(d2, """{"x": {"$gt": "{y}"}}""")
      .select("id").as[String].collect().toSeq
    assert(got == Seq("b"))
  }

  test("top-level column with a dot in its name is not a struct walk") {
    val d2 = Seq(("a", 1), ("b", 5)).toDF("id", "a.b")
    val got = Filters.where(d2, """{"a.b": {"$gte": 5}}""")
      .select("id").as[String].collect().toSeq
    assert(got == Seq("b"))
    val bt = Filters.where(d2, """{"`a.b`": {"$lt": 5}}""")
      .select("id").as[String].collect().toSeq
    assert(bt == Seq("a"))
  }

  test("compiled predicates push down to the parquet scan") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plan = Filters.where(li,
      """{"l_quantity": {"$gte": 45}, "l_returnflag": "R"}""")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("GreaterThanOrEqual(l_quantity,45.0)"), plan.take(900))
    assert(plan.contains("EqualTo(l_returnflag,R)"))
  }

  test("unknown operator and unknown field fail fast") {
    intercept[IllegalArgumentException](ids("""{"num": {"$bogus": 1}}"""))
    intercept[IllegalArgumentException](ids("""{"nope": 1}"""))
  }
}
