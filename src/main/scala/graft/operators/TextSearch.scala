package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{PorterStemmer, TextFunctions}

/** Full-text search over the `text` column — the reference's
  * `find(query_text)` (reference: docarray/array/mixins/find.py:147-156,
  * backed there by elasticsearch match queries,
  * docarray/array/storage/elastic/find.py:74-114).
  *
  * Spark-native shape: tokenize → inverted-index semi-join on the query's
  * terms (docs without any query term never leave the scan) → per-doc BM25
  * score → top-k. Corpus statistics (N, avgdl, df) are computed in-plan and
  * broadcast — no driver-side collection.
  */
object TextSearch {

  /** BM25 relevance (Lucene-style idf) of every doc matching >= 1 query
    * term. Output: (id, score), descending relevance left to the caller. */
  def bm25(docs: DataFrame, idCol: String, textCol: String, query: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTokens = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct.toSeq
    bm25Core(docs, idCol, textCol, qTokens, identity, k1, b)
  }

  /** BM25 over Porter-STEMMED terms — inflection-robust retrieval: query
    * and corpus surface forms collapse to shared stems BEFORE tf/df/
    * scoring, so "querying tables" matches docs saying "query"/"table"
    * (which plain [[bm25]] misses entirely). One stemmer serves both
    * sides: the in-plan codegen scalar `porter_stem` for corpus tokens
    * and the same [[PorterStemmer.stem]] driver-side for the handful of
    * query terms. Statistics chain identical to [[bm25]]. */
  def bm25Stemmed(docs: DataFrame, idCol: String, textCol: String,
      query: String, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTokens = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      .map(PorterStemmer.stem).distinct.toSeq
    bm25Core(docs, idCol, textCol, qTokens,
      t => graft.functions.porter_stem(t), k1, b)
  }

  /** Shared BM25 chain; `analyze` maps each exploded token (identity for
    * surface-form search, `porter_stem` for stemmed). Doc length counts
    * analyzed tokens — for per-token maps the count is unchanged. */
  private def bm25Core(docs: DataFrame, idCol: String, textCol: String,
      qTokens: Seq[String], analyze: Column => Column,
      k1: Double, b: Double): DataFrame = {

    val toks = docs.select(col(idCol).as("_id"),
        explode(TextFunctions.tokens(col(textCol))).as("_raw"))
      .select(col("_id"), analyze(col("_raw")).as("_tok"))

    val dl = toks.groupBy("_id").agg(count(lit(1)).as("_dl"))
    val stats = dl.agg(avg("_dl").as("_avgdl"), count(lit(1)).as("_n"))

    val hits = toks.where(col("_tok").isin(qTokens: _*))
    val tf = hits.groupBy("_id", "_tok").agg(count(lit(1)).as("_tf"))
    val dfreq = tf.groupBy("_tok").agg(count(lit(1)).as("_df"))

    val idf = log((col("_n") - col("_df") + 0.5) / (col("_df") + 0.5) + 1.0)
    val tfNorm = col("_tf") * (k1 + 1) /
      (col("_tf") + lit(k1) * (lit(1 - b) + lit(b) * col("_dl") / col("_avgdl")))

    tf.join(broadcast(dfreq), "_tok")
      .join(dl, "_id")
      .crossJoin(broadcast(stats))
      .withColumn("_term_score", idf * tfNorm)
      .groupBy("_id").agg(sum("_term_score").as("score"))
      .select(col("_id").as(idCol), col("score"))
  }

  /** TF-IDF top terms per document — the per-doc keyword profile used for
    * topic tagging and sparse (lexical) retrieval vectors. Smooth idf
    * `ln((N+1)/(df+1)) + 1` (never zero, so single-doc terms still rank),
    * weight = raw tf × idf.
    *
    * Scale shape: tf and df are two shuffled aggregations over the token
    * explode (both with map-side partial combine); N rides along as a
    * broadcast 1-row aggregate, never a driver-side count; the tf↔df join
    * shuffles on the term (df is NOT broadcast — a web-scale vocabulary
    * does not fit); the final top-k is a window PARTITIONED by doc, so no
    * global sort anywhere. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("_id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_id").orderBy(col("weight").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("weight",
        col("tf") * (log((col("_n") + 1.0) / (col("df") + 1.0)) + 1.0))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("_id").as(idCol), col("rank"), col("term"),
        col("tf").cast("int").as("tf"), col("df").cast("int").as("df"),
        col("weight"))
  }

  /** Hybrid lexical+vector retrieval with reciprocal-rank fusion — the
    * standard two-tower search a RAG/retrieval pipeline runs: BM25 over the
    * text corpus and cosine-knn over the embedding table, fused by
    * RRF(d) = Σ 1/(rrfK + rank_i(d)) over the rankers that returned d in
    * their top `depth`.
    *
    * Scale shape: each ranker is truncated to `depth` with
    * `orderBy(...).limit(depth)` — Spark plans that as TakeOrderedAndProject
    * (per-partition top-k, merge of k·parts rows), NOT a global sort; the
    * within-list rank is then a window over ≤ depth rows (trivially one
    * tiny partition) and the fusion is a full outer join of two ≤ depth
    * lists. BM25 ranks on the 4-dp-rounded score (ties → id) because a
    * float sum's partial-agg order is nondeterministic; cosine ranks on the
    * raw distance (a fixed-order dot product, bit-stable). Docs missing
    * from one list carry rank 0 = "not retrieved" and contribute nothing.
    *
    * Output: (id, rank_text, rank_vec, rrf), descending rrf. */
  def hybridRrf(docs: DataFrame, docId: String, textCol: String,
      vecs: DataFrame, vecId: String, vecCol: String,
      queryText: String, queryVec: Array[Double],
      k: Int, depth: Int = 50, rrfK: Int = 60): DataFrame = {
    val ss = docs.sparkSession
    val textScored = bm25(docs, docId, textCol, queryText)
      .select(col(docId).as("_id"), round(col("score"), 4).as("_ts"))
      .orderBy(col("_ts").desc, col("_id")).limit(depth)
    val wT = org.apache.spark.sql.expressions.Window
      .orderBy(col("_ts").desc, col("_id"))
    val textRank = textScored
      .withColumn("rank_text", row_number().over(wT)).drop("_ts")

    val qdf = ss.createDataFrame(Seq(Tuple2(0L, queryVec.toSeq)))
      .toDF("_qid", "_qv")
    val vecRank = graft.operators.Knn.bruteForce(
        vecs, qdf, k = depth, metric = "cosine",
        docId = vecId, docVec = vecCol, queryId = "_qid", queryVec = "_qv")
      .select(col("id").as("_id"), col("rank").as("rank_vec"))

    textRank.join(vecRank, Seq("_id"), "full")
      .select(col("_id").as(docId),
        coalesce(col("rank_text"), lit(0)).as("rank_text"),
        coalesce(col("rank_vec"), lit(0)).as("rank_vec"))
      .withColumn("rrf",
        when(col("rank_text") > 0, lit(1.0) / (col("rank_text") + rrfK)).otherwise(0.0) +
        when(col("rank_vec") > 0, lit(1.0) / (col("rank_vec") + rrfK)).otherwise(0.0))
      .orderBy(col("rrf").desc, col(docId)).limit(k)
  }

  /** Exact phrase search over a positional inverted index: every
    * occurrence of `phrase`'s token sequence at consecutive token
    * positions. BM25 can rank by bag-of-terms but cannot answer "these
    * words, adjacent, in this order" — the quoted-query operator every
    * search surface needs.
    *
    * Physical shape: posexplode the tokens, PRUNE the postings to the
    * phrase's distinct terms at the scan (everything else dies before
    * any shuffle), then one equi-join per remaining phrase token on
    * (id, pos − i) — k−1 hash joins over term-postings lists, never a
    * string scan of the corpus. Overlapping occurrences are found
    * naturally ("x x x" matches "x x" at 0 AND 1). Output: (idCol,
    * pos) — one row per occurrence, pos = 0-based first-token index. */
  def phrasePositions(docs: DataFrame, idCol: String, textCol: String,
      phrase: String): DataFrame = {
    val p = phrase.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    require(p.nonEmpty, "phrase has no tokens")
    val toks = docs.select(col(idCol).as("_id"),
        posexplode(TextFunctions.tokens(col(textCol))))
      .toDF("_id", "_pos", "_tok")
      .where(col("_tok").isin(p.distinct.toSeq: _*))
    val first = toks.where(col("_tok") === p(0))
      .select(col("_id"), col("_pos"))
    p.toSeq.zipWithIndex.drop(1).foldLeft(first) { case (acc, (w, i)) =>
      acc.join(
        toks.where(col("_tok") === w)
          .select(col("_id").as("_id2"), (col("_pos") - i).as("_p2")),
        col("_id") === col("_id2") && col("_pos") === col("_p2"))
        .select(col("_id"), col("_pos"))
    }.select(col("_id").as(idCol), col("_pos").as("pos"))
  }

  /** Per-doc phrase occurrence counts (docs with zero matches absent). */
  def phraseCounts(docs: DataFrame, idCol: String, textCol: String,
      phrase: String): DataFrame =
    phrasePositions(docs, idCol, textCol, phrase)
      .groupBy(idCol).agg(count(lit(1)).as("n_matches"))

  /** Proximity search: every (posA, posB) co-occurrence of two distinct
    * terms within `window` token positions (|posA − posB| <= window),
    * same pruned-postings shape as [[phrasePositions]] — one equi-join
    * on the doc id over the two terms' postings with the distance test
    * in-join. Per-doc output is |A|·|B| filtered pairs; for stop-word
    * terms compose with a document-frequency valve upstream. */
  def proximityPairs(docs: DataFrame, idCol: String, textCol: String,
      termA: String, termB: String, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val toks = docs.select(col(idCol).as("_id"),
        posexplode(TextFunctions.tokens(col(textCol))))
      .toDF("_id", "_pos", "_tok")
    val a = toks.where(col("_tok") === termA.toLowerCase)
      .select(col("_id"), col("_pos").as("pos_a"))
    val b = toks.where(col("_tok") === termB.toLowerCase)
      .select(col("_id").as("_id2"), col("_pos").as("pos_b"))
    // pos_a =!= pos_b: no-op for distinct terms (one token per
    // position), and for termA == termB it drops the degenerate
    // self-match of an occurrence with itself
    a.join(b, col("_id") === col("_id2") &&
        col("pos_a") =!= col("pos_b") &&
        abs(col("pos_a") - col("pos_b")) <= window)
      .select(col("_id").as(idCol), col("pos_a"), col("pos_b"))
  }

  /** Simple match search: docs containing >= minShould of the query's
    * distinct terms, scored by the count of matched terms. */
  def matchAny(docs: DataFrame, idCol: String, textCol: String, query: String,
      minShould: Int = 1): DataFrame = {
    val qTokens = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct.toSeq
    docs.select(col(idCol),
      size(array_intersect(TextFunctions.tokenSet(col(textCol)),
        array(qTokens.map(lit): _*))).as("matched"))
      .where(col("matched") >= minShould)
  }

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal token runs between stopword/boundary delimiters; a word's
    * score is deg/freq over candidate occurrences (deg = Σ length of
    * the phrases it appears in — words that live in long multiword
    * phrases score up); a phrase's score is the sum of its member
    * occurrences' word scores. The unsupervised corpus-keyword table
    * ("what is this crawl slice about") next to [[tfidfTopTerms]]'s
    * per-doc terms.
    *
    * Exactness: word ratios are quantized ONCE to ppm by floor division
    * of exact counts, phrase scores are exact integer sums of those —
    * layout-invariant, engine-replayable. Identical phrase strings
    * share one output row (identical members ⇒ identical score).
    *
    * Scale shape: segment ids from a per-document window (bounded by
    * doc length), phrase assembly one bounded groupBy, word stats
    * vocabulary-sized with map-side combine. Tokenization is the
    * corpus's single-space convention; callers lowercase/normalize
    * upstream. Returns (phrase, n_occ, score_ppm). */
  def rakeKeywords(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(stopwords.nonEmpty, "rakeKeywords needs >= 1 stopword")
    val tok = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("_d"),
        posexplode(split(col(textCol), " ")).as(Seq("_pos", "_w")))
      .where(length(col("_w")) > 0)
      .withColumn("_st",
        when(col("_w").isin(stopwords.map(_.asInstanceOf[Any]): _*), 1L)
          .otherwise(0L))
    val wseg = Window.partitionBy("_d").orderBy("_pos")
    val cand = tok.withColumn("_seg", sum("_st").over(wseg))
      .where(col("_st") === 0)
    val ph = cand.groupBy("_d", "_seg").agg(
      count(lit(1)).as("_len"),
      concat_ws(" ", transform(
        sort_array(collect_list(struct(col("_pos"), col("_w")))),
        s => s.getField("_w"))).as("phrase"))
    val mem = cand.select("_d", "_seg", "_w")
      .join(ph.select("_d", "_seg", "_len"), Seq("_d", "_seg"))
    val wr = mem.groupBy("_w")
      .agg(count(lit(1)).as("_freq"), sum("_len").as("_deg"))
      .withColumn("_ratio", expr("(_deg * 1000000) div _freq"))
    val pscore = mem.join(wr.select("_w", "_ratio"), "_w")
      .groupBy("_d", "_seg").agg(sum("_ratio").as("_score"))
    ph.join(pscore, Seq("_d", "_seg"))
      .groupBy("phrase")
      .agg(count(lit(1)).as("n_occ"), max("_score").as("score_ppm"))
  }

  /** c-TF-IDF cluster labeling (the BERTopic topic-word step,
    * Grootendorst 2022): each cluster's top terms by
    * tf_{t,c} · ln(1 + A / f_t), where tf is the term's count INSIDE
    * the cluster, f_t its count across ALL clusters, and A the average
    * token mass per cluster — class-based TF-IDF, so a term ranks high
    * when it is frequent in THIS cluster but rare corpus-wide. The
    * "what do my clusters mean" step after q204's text clustering /
    * q178's topics. Exact skeleton: tf and f_t are integer counts from
    * two aggregations of one tokenization; the ln factor quantizes
    * ONCE to ppb (the LLR rule), score = tf · idf_ppb in Decimal;
    * per-cluster top-k via a (score DESC, term ASC) rank window
    * partitioned by cluster. Returns
    * (cluster, term, tf, idf_ppb, rank). */
  def clusterTerms(docs: DataFrame, clusterCol: Column, textCol: Column,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val tok = docs.where(textCol.isNotNull && clusterCol.isNotNull)
      .select(clusterCol.as("_c"),
        explode(graft.functions.TextFunctions.tokens(textCol)).as("_w"))
    val tf = tok.groupBy("_c", "_w").agg(count(lit(1)).as("_tf"))
    val ft = tf.groupBy("_w").agg(sum("_tf").as("_ft"))
    val totals = tf.agg(sum("_tf").as("_T"),
      countDistinct("_c").as("_K"))
    val scored = tf.join(ft, "_w").crossJoin(broadcast(totals))
      .withColumn("_idf_ppb", round(log(lit(1.0) +
        (col("_T").cast("double") / col("_K").cast("double")) /
          col("_ft").cast("double")) * 1e9).cast("long"))
      .withColumn("_score",
        col("_tf").cast("decimal(38,0)") *
          col("_idf_ppb").cast("decimal(38,0)"))
    val w = Window.partitionBy(col("_c"))
      .orderBy(col("_score").desc, col("_w").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("_c").as("cluster"), col("_w").as("term"),
        col("_tf").as("tf"), col("_idf_ppb").as("idf_ppb"), col("rank"))
  }

  /** Prefix-completion index (the autocomplete/typeahead table): for
    * every token prefix of length `minLen..maxLen`, the `topK` most
    * frequent corpus completions with the (count desc, word asc) tie
    * rule — exact integer counts end to end.
    *
    * Scale shape: the corpus collapses to its VOCABULARY first (one
    * token-count aggregation with map-side combine), so the prefix
    * explode and the per-prefix rank window run over vocabulary-sized
    * data — bounded by |vocab|·(maxLen−minLen+1) rows, never corpus
    * rows. Returns (prefix, rank, word, cnt). */
  def prefixCompletions(docs: DataFrame, textCol: Column,
      minLen: Int = 1, maxLen: Int = 4, topK: Int = 3): DataFrame = {
    require(minLen >= 1 && maxLen >= minLen && topK >= 1,
      s"bad prefix bounds ($minLen, $maxLen, $topK)")
    val vocab = docs
      .select(explode(graft.functions.TextFunctions.tokens(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("prefix").orderBy(col("cnt").desc, col("word").asc)
    vocab
      .where(length(col("word")) >= minLen)
      .select(col("word"), col("cnt"),
        explode(sequence(lit(minLen), least(lit(maxLen), length(col("word")))))
          .as("_plen"))
      .select(expr("substring(word, 1, _plen)").as("prefix"),
        col("word"), col("cnt"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("prefix"), col("rank"), col("word"), col("cnt"))
  }

  /** SymSpell-style spelling correction: map each query token to its
    * best vocabulary word within Levenshtein distance ≤ 1, via
    * DELETION-NEIGHBORHOOD blocking (Garbe's SymSpell) — both sides
    * expand to {word} ∪ {word minus one char}, and two strings are
    * within edit 1 (ins/del/sub) IFF their neighborhoods intersect, so
    * candidate generation is COMPLETE (deterministic — unlike minhash
    * banding, which [[graft.operators.Dedup.editDistancePairs]] uses
    * for the long-string regime) while never forming the token×vocab
    * product. Best pick per token: (distance asc, freq desc, word asc).
    * Tokens with no match within 1 are absent (caller left-joins).
    *
    * Scale shape: explode factor len+1 per word (capped at `maxLen` —
    * longer tokens pass through unmatched rather than exploding), one
    * equi-join on short delete-keys, exact `levenshtein` verify inside
    * the join, one per-token argmin window over ≤ a handful of
    * verified candidates. Returns (token, word, dist, freq). */
  def spellCorrect(tokens: DataFrame, tokCol: String, vocab: DataFrame,
      wordCol: String, freqCol: String, maxLen: Int = 24): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    // {c} ∪ {c with the char at position i removed}; a 1-char token
    // contributes "" — the key that lets two 1-char tokens meet (their
    // edit distance is 1 via substitution). array_union dedups the
    // repeated deletes of doubled letters.
    def deletes(c: Column): Column = array_union(
      array(c),
      transform(sequence(lit(1), length(c)), i =>
        concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c)))))
    val toks = tokens.select(col(tokCol).as("token")).distinct()
      .where(col("token").isNotNull && length(col("token")) <= maxLen &&
        length(col("token")) >= 1)
      .select(col("token"), explode(deletes(col("token"))).as("_k"))
    val words = vocab.select(col(wordCol).as("word"),
        col(freqCol).cast("long").as("freq"))
      .where(col("word").isNotNull && length(col("word")) <= maxLen &&
        length(col("word")) >= 1)
      .select(col("word"), col("freq"), explode(deletes(col("word"))).as("_k"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("token")
      .orderBy(col("dist").asc, col("freq").desc, col("word").asc)
    toks.join(words, "_k")
      .select(col("token"), col("word"), col("freq"),
        levenshtein(col("token"), col("word")).as("dist"))
      .where(col("dist") <= 1)
      .distinct()
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col("token"), col("word"), col("dist"), col("freq"))
  }
}
