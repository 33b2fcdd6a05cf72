package graft

import org.apache.spark.sql.functions._

import graft.functions.{jaro_similarity, jaro_winkler_similarity}
import graft.operators.Dedup

/** Jaro / Jaro–Winkler kernel pinned to the oracle engine's semantics
  * (verified probe-by-probe against DuckDB 1.x `jaro_winkler_similarity`):
  * byte-level matching, integer-halved transpositions, boost only above
  * 0.7, prefix cap 4 — plus the bigram-blocked fuzzyLink argmax. */
class StringSimilaritySpec extends SparkSuite {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(jaro_winkler_similarity(col("a"), col("b")))
      .head().getDouble(0)
  private def j(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(jaro_similarity(col("a"), col("b")))
      .head().getDouble(0)

  test("textbook values match the oracle engine bit-for-bit") {
    assert(j("martha", "marhta") === 0.9444444444444445)
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(j("dwayne", "duane") === 0.8222222222222223)
    assert(jw("dwayne", "duane") === 0.8400000000000001)
    assert(j("dixon", "dicksonx") === 0.7666666666666666)
    assert(jw("dixon", "dicksonx") === 0.8133333333333332)
  }

  test("integer-halved transpositions (3 order mismatches -> t=1)") {
    // matched sequences abcdefg vs bcadefg differ at 3 positions; the
    // float-t convention would give 0.928571..., the oracle's integer
    // division gives (1 + 1 + 6/7)/3
    assert(j("abcdefg", "bcadefg") === 0.9523809523809524)
  }

  test("boost threshold: no Winkler bonus at jaro <= 0.7") {
    assert(jw("abcdefgh", "abzzzzzz") === 0.5) // prefix 2 but jaro 0.5
    assert(jw("abcdefgh", "abcdezzz") === 0.85) // jaro 0.75, prefix capped at 4
  }

  test("byte-level semantics on multi-byte code points") {
    // 'é' is two UTF-8 bytes: lengths 5 vs 4, m=3 -> (3/5 + 3/4 + 1)/3
    assert(j("café", "cafe") === 0.7833333333333333)
    assert(jw("café", "cafe") === 0.8483333333333334)
  }

  test("empty and degenerate inputs") {
    assert(j("", "") === 0.0)
    assert(j("a", "") === 0.0)
    assert(jw("", "abc") === 0.0)
    assert(j("ab", "ba") === 0.0) // window 0: nothing matches
    assert(j("same", "same") === 1.0 && jw("same", "same") === 1.0)
  }

  test("fuzzyLink: best match per dirty record, tie -> min right id") {
    val dirty = Seq((1L, "blue boltt"), (2L, "red widgt"), (3L, "xyzqw"))
      .toDF("id", "name")
    val canon = Seq("blue bolt", "red widget", "red gadget")
      .toDF("cname").select(col("cname"), col("cname").as("cid"))
    val out = Dedup.fuzzyLink(dirty, canon, "id", "name", "cid", "cname",
        threshold = 0.8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "blue bolt")
    assert(out(2L) === "red widget")
    assert(!out.contains(3L)) // shares no bigram or below threshold
  }

  test("damerau_levenshtein: true-DL hand cases, bytes, nulls, SQL name") {
    import graft.functions.damerau_levenshtein
    val pairs = Seq(
      ("CA", "ABC", 2),       // TRUE DL: edit between the transposed pair
      ("teh", "the", 1),      // adjacent swap costs 1
      ("ab", "ba", 1),
      ("abc", "abc", 0),
      ("", "abc", 3),
      ("kitten", "sitting", 3),
      ("héllo", "hello", 2) // byte semantics: é is two UTF-8 bytes
    ).toDF("a", "b", "want")
    val got = pairs.select(damerau_levenshtein(col("a"), col("b"))
      .as("dl"), col("want")).collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // null propagates
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(damerau_levenshtein(col("a"), col("b"))).head
    assert(n.isNullAt(0))
    // SQL registration
    graft.functions.registerAll(spark)
    assert(spark.sql("SELECT damerau_levenshtein('CA', 'ABC')")
      .head.getInt(0) === 2)
  }

  test("fuzzyLink: equal-score tie resolves to the min right id") {
    val dirty = Seq((1L, "abz")).toDF("id", "name")
    val canon = Seq("aby", "abx").toDF("cname")
      .select(col("cname"), col("cname").as("cid"))
    val r = Dedup.fuzzyLink(dirty, canon, "id", "name", "cid", "cname",
      threshold = 0.5).head()
    assert(r.getString(1) === "abx" && r.getLong(2) === 2L)
  }

  test("fuzzyLink: maxDocFreq valve drops hot bigrams from blocking") {
    // every canon name shares the hot bigram "aa"; with the valve at 1
    // the only blocking key left is the discriminating tail bigram
    val dirty = Seq((1L, "aaxy")).toDF("id", "name")
    val canon = Seq("aaxz", "aaqq", "aaqr").toDF("cname")
      .select(col("cname"), col("cname").as("cid"))
    val all = Dedup.fuzzyLink(dirty, canon, "id", "name", "cid", "cname",
      threshold = 0.0)
    val valved = Dedup.fuzzyLink(dirty, canon, "id", "name", "cid", "cname",
      threshold = 0.0, maxDocFreq = 1L)
    assert(all.head().getLong(2) === 3L) // n_cand: all three share 'aa'
    assert(valved.head().getLong(2) === 1L) // only 'xy'~'xz' block remains
  }
}
