package graft

import org.apache.spark.sql.functions._
import graft.operators.{FilterFuzz, Filters}

/** The generative filter gate (q356): determinism, construct coverage,
  * compilability of every generated filter, and the null-semantics
  * edges the generator exists to exercise. The Spark-vs-DuckDB value
  * equality itself is the driver gate's job (tools/check.py replays
  * [[FilterFuzz.oracleSql]]). */
class FilterFuzzSpec extends SparkSuite {
  import spark.implicits._

  private val cases = FilterFuzz.cases()

  test("generator is a pure function of the seed") {
    assert(cases == FilterFuzz.cases())
    assert(cases.size == 120)
    // a different seed is a different corpus (the seed is load-bearing)
    assert(FilterFuzz.cases(seed = 1L) != cases)
  }

  test("corpus covers every operator and construct class") {
    val all = cases.map(_._1).mkString("\n")
    val required = Seq("$eq", "$neq", "$gt", "$gte", "$lt", "$lte",
      "$in", "$nin", "$regex", "$size", "$exists", "$and", "$or", "$not",
      "$contains", "$startswith",
      "tags__", "tags__missing", "{n_chars}")
    val missing = required.filterNot(all.contains)
    assert(missing.isEmpty, s"constructs absent from the corpus: $missing")
    // list-AND: at least one filter whose root (or $and/$or member) is
    // a JSON array
    assert(cases.exists(_._1.startsWith("[")) || all.contains("["),
      "no list-AND in the corpus")
  }

  test("every generated filter compiles and the one-scan gate matches per-filter WHERE") {
    val docs = Seq(
      (0L, "key agg row scan", "en", "src0", 17L),
      (1L, "zz merge hash", "de", "src12", 100L),
      (2L, "value row value", "zh", "src3", 298L),
      (3L, "the end value", "fr", "src19", 48L),
      (4L, "key value table", "es", "srcX", 553L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val frame = docs.select(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars"),
      map(lit("lang"), col("lang"), lit("n"),
        col("n_chars").cast("string")).as("tags"),
      split(col("text"), " ").as("words"))
    val got = FilterFuzz.gate(docs).collect()
    assert(got.length == 120)
    // the unpivoted conditional aggregates must equal a literal
    // per-filter WHERE — same compiler, two plan shapes
    cases.zipWithIndex.foreach { case ((json, _), i) =>
      val rows = frame.where(Filters.compile(json, frame.schema))
        .agg(count(lit(1)), coalesce(sum("doc_id"), lit(0L)))
        .head
      assert(got(i).getInt(0) == i)
      assert(got(i).getLong(1) == rows.getLong(0),
        s"filter $i cnt mismatch for $json")
      assert(got(i).getLong(2) == rows.getLong(1),
        s"filter $i id_sum mismatch for $json")
    }
  }

  test("null map key: $nin and $exists(false) match, the rest drop") {
    val docs = Seq((1L, "a b", "en", "src0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def n(json: String): Long = {
      val f = docs.select(col("doc_id"),
        map(lit("lang"), col("lang")).as("tags"))
      f.where(Filters.compile(json, f.schema)).count()
    }
    assert(n("""{"tags__missing": {"$nin": ["x"]}}""") == 1L)
    assert(n("""{"tags__missing": {"$exists": false}}""") == 1L)
    assert(n("""{"tags__missing": {"$in": ["x"]}}""") == 0L)
    assert(n("""{"tags__missing": {"$eq": "x"}}""") == 0L)
    assert(n("""{"tags__missing": {"$neq": "x"}}""") == 0L)
    assert(n("""{"tags__missing": {"$regex": "x"}}""") == 0L)
    assert(n("""{"tags__missing": {"$exists": true}}""") == 0L)
  }
}
