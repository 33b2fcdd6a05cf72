package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Unigram language-model scoring — the corpus-level quality signal the
  * big pretraining pipelines (CCNet and successors) use to rank and
  * bucket documents: train a cheap LM on the corpus (here: unigram token
  * frequencies), score every document by its per-token negative
  * log-likelihood, and split the corpus into quality buckets.
  *
  * The reference has no LM surface (its quality signals are the per-doc
  * text mixins); this is a beyond-reference training-pipeline operator in
  * the same family as [[graft.functions.TextFunctions.qualityScore]] and
  * the Gopher repetition rules.
  *
  * Scale shape: the model IS a DataFrame (`word, n`) — it never leaves
  * the cluster. Scoring is one explode + one equi-join on `word` + one
  * groupBy on the doc id: two shuffles total, both on keys Spark handles
  * at any scale (the join side is vocabulary-sized and AQE will broadcast
  * it when it fits). No driver-side vocabulary, no UDFs — every step is
  * codegen'd builtin expressions, so the whole score pass stays inside
  * whole-stage codegen.
  */
object LangModel {

  /** Token-frequency model: (`word`, `n`) over the tokenized corpus —
    * [[GroupOps.vocabulary]] with no frequency floor, kept as its own
    * name because it is the *model* here, not a vocabulary report. */
  def unigramFit(docs: DataFrame, textCol: Column): DataFrame =
    GroupOps.vocabulary(docs, textCol, minFreq = 1)

  /** Score each document under a fitted unigram model: mean per-token
    * negative log-likelihood `-avg(ln(n_w / total))` (natural log; lower
    * = more typical of the corpus). Tokens absent from the model get
    * `ln(smooth / total)` — with the default `smooth = 1` that is
    * add-nothing for a model fitted on the same corpus (no OOV) and
    * Laplace-ish for a transfer-scored one.
    *
    * Returns one row per input doc: (idCol, `n_tokens`, `nll`); docs with
    * no tokens get a null `nll`.
    */
  def unigramNll(docs: DataFrame, model: DataFrame, idCol: String,
      textCol: Column, smooth: Double = 1.0): DataFrame = {
    // r10: the model frame is read twice (total + the score join) and
    // this function is already eager (head below) — materialize the
    // vocabulary-sized model once instead of re-running its corpus
    // aggregation per reference (guide §5 caching: reused AND expensive)
    val m = model.localCheckpoint()
    val total = m.agg(sum(col("n"))).head.getLong(0)
    val toks = docs
      .select(col(idCol), explode(TextFunctions.tokens(textCol)).as("word"))
    val scored = toks
      .join(m, Seq("word"), "left")
      .select(col(idCol),
        log(coalesce(col("n").cast("double"), lit(smooth)) / lit(total.toDouble))
          .as("_lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("int").as("n_tokens"), (-avg(col("_lp"))).as("nll"))
    // docs whose text tokenizes to nothing still get a row (null score)
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_tokens"), lit(0)).as("n_tokens"),
        col("nll"))
  }

  /** Moore–Lewis contrastive data selection (Moore & Lewis, ACL 2010):
    * score each doc by its mean per-token NLL under a GENERAL unigram
    * model minus its NLL under an IN-DOMAIN model fit on the subset
    * matching `inDomain`. Positive = the in-domain model explains the
    * doc better than the background — select it for domain-targeted
    * training. This is the cross-entropy-difference criterion behind
    * most "select web data that looks like my target corpus" pipelines
    * (and the intelligent-selection step DSIR generalizes).
    *
    * One token pass: a single explode, both models joined onto the same
    * token stream, one aggregate — not two [[unigramNll]] runs (which
    * would tokenize and shuffle the corpus twice). OOV under either
    * model scores `ln(smooth / total)` of that model. The keep flag is
    * computed on the ROUND-6 score so the boundary is engine-portable.
    *
    * At 100 TB: two broadcast-sized model joins (vocabulary scale) and
    * one groupBy(doc) — map-side combine collapses token rows early.
    *
    * Returns (idCol, `n_tokens`, `nll_in_r`, `nll_gen_r`, `ml_r`,
    * `keep`); token-less docs get null scores and a null keep.
    */
  def mooreLewisScore(docs: DataFrame, idCol: String, textCol: Column,
      inDomain: Column, smooth: Double = 1.0): DataFrame = {
    val genModel = unigramFit(docs, textCol)
    val inModel = unigramFit(docs.where(inDomain), textCol)
    val totalG = genModel.agg(sum(col("n"))).head.getLong(0)
    val totalI = inModel.agg(sum(col("n"))).head.getLong(0)
    val toks = docs
      .select(col(idCol), explode(TextFunctions.tokens(textCol)).as("word"))
    val scored = toks
      .join(genModel.withColumnRenamed("n", "_ng"), Seq("word"), "left")
      .join(inModel.withColumnRenamed("n", "_ni"), Seq("word"), "left")
      .select(col(idCol),
        log(coalesce(col("_ng").cast("double"), lit(smooth)) / lit(totalG.toDouble)).as("_lpg"),
        log(coalesce(col("_ni").cast("double"), lit(smooth)) / lit(totalI.toDouble)).as("_lpi"))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        (-avg(col("_lpi"))).as("_nll_in"),
        (-avg(col("_lpg"))).as("_nll_gen"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0)).as("n_tokens"),
        round(col("_nll_in"), 6).as("nll_in_r"),
        round(col("_nll_gen"), 6).as("nll_gen_r"),
        round(col("_nll_gen") - col("_nll_in"), 6).as("ml_r"))
      .withColumn("keep", col("ml_r") > 0)
  }

  /** Zipf-law fit per group: regress `ln(freq)` on `ln(rank)` over the
    * group's term-frequency table and report the least-squares slope —
    * the corpus-health diagnostic (natural language sits near −1;
    * boilerplate/templated or synthetic text drifts off, so a per-source
    * slope table flags degenerate sources before they enter a mix).
    *
    * Engine-portable by the ppb-integer rule: each term's `ln(rank)`,
    * `ln(n)`, their product and square are pure functions of exact
    * integers, rounded to ppb longs PER TERM, then summed (order-free).
    * The slope is one fixed float chain over the five gated sums.
    *
    * Ranks are per-group `row_number` by (freq desc, word asc) over the
    * group's vocabulary — vocabulary-sized partitions (not corpus-sized);
    * at 100 TB vocabulary scale switch the rank stage to the
    * [[GroupOps.vocabIds]] range-partition machinery.
    *
    * Output per group: (`groupCol`, `n_terms`, `sx`, `sy`, `sxy`, `sxx`
    * — ppb longs — and `zipf_slope_r`). */
  def zipfFit(docs: DataFrame, groupCol: String, textCol: Column,
      minCount: Long = 1L): DataFrame = {
    val counts = docs
      .select(col(groupCol), explode(TextFunctions.tokens(textCol)).as("_w"))
      .groupBy(groupCol, "_w").agg(count(lit(1)).as("_n"))
      .where(col("_n") >= minCount)
    val w = Window.partitionBy(groupCol)
      .orderBy(col("_n").desc, col("_w").asc)
    val ppb = (c: Column) => round(c * lit(1e9)).cast("long")
    val terms = counts
      .withColumn("_r", row_number().over(w).cast("double"))
      .select(col(groupCol),
        ppb(log(col("_r"))).as("_x"),
        ppb(log(col("_n").cast("double"))).as("_y"),
        ppb(log(col("_r")) * log(col("_n").cast("double"))).as("_xy"),
        ppb(log(col("_r")) * log(col("_r"))).as("_xx"))
    val g = terms.groupBy(groupCol).agg(
      count(lit(1)).as("n_terms"),
      sum(col("_x")).as("sx"), sum(col("_y")).as("sy"),
      sum(col("_xy")).as("sxy"), sum(col("_xx")).as("sxx"))
    val R = col("n_terms").cast("double")
    val e9 = lit(1e9)
    val num = R * (col("sxy").cast("double") / e9) -
      (col("sx").cast("double") / e9) * (col("sy").cast("double") / e9)
    val den = R * (col("sxx").cast("double") / e9) -
      (col("sx").cast("double") / e9) * (col("sx").cast("double") / e9)
    g.select(col(groupCol), col("n_terms"),
      col("sx"), col("sy"), col("sxy"), col("sxx"),
      when(den > 0, round(num / den, 6)).as("zipf_slope_r"))
  }

  /** First-order Markov-chain scoring of event sequences: fit MLE
    * transition probabilities `P(s2|s1) = n(s1,s2) / n(s1,·)` over every
    * group's ordered state stream, then score each group by the mean
    * transition NLL — the behavioral twin of [[bigramNll]] (documents →
    * event streams). Low NLL = a typical session; high = anomalous
    * (bots, broken clients, fraud — the rows a training pipeline wants
    * flagged before user-behavior data becomes features).
    *
    * Sequence extraction is a lag over (`groupCol` partition, `orderCols`
    * order) — per-group windows, never a global sort; groups are
    * user-sized, so partitions stay bounded at any corpus scale (skewed
    * mega-users should be capped upstream). The transition model is a
    * groupBy the size of the state alphabet squared — broadcast-joined
    * back.
    *
    * Returns one row per group: (groupCol, `n_trans`, `nll`); groups
    * with fewer than 2 events get `n_trans = 0` and a null score. */
  def markovChainNll(df: DataFrame, groupCol: String, orderCols: Seq[Column],
      stateCol: Column): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCols: _*)
    val pairs = df
      .select(col(groupCol), lag(stateCol, 1).over(w).as("_s1"),
        stateCol.as("_s2"))
      .where(col("_s1").isNotNull)
    val bi = pairs.groupBy("_s1", "_s2").agg(count(lit(1)).as("_n"))
    val lm = bi.groupBy("_s1").agg(sum(col("_n")).as("_c1"))
    val scored = pairs
      .join(bi, Seq("_s1", "_s2"))
      .join(lm, Seq("_s1"))
      .groupBy(groupCol)
      .agg(count(lit(1)).cast("int").as("n_trans"),
        (-avg(log(col("_n").cast("double") / col("_c1").cast("double"))))
          .as("nll"))
    df.select(col(groupCol)).distinct()
      .join(scored, Seq(groupCol), "left")
      .select(col(groupCol), coalesce(col("n_trans"), lit(0)).as("n_trans"),
        col("nll"))
  }

  /** Adjacent token pairs of each doc: (idCol, `w1`, `w2`) — one row per
    * bigram occurrence. zip of the token array with its own tail, fully
    * codegen'd (slice + arrays_zip + explode). */
  private def bigramPairs(docs: DataFrame, idCol: String,
      textCol: Column): DataFrame =
    docs.where(graft.functions.has_min_tokens(textCol, 2))
      .select(col(idCol), TextFunctions.tokens(textCol).as("_l"))
      .select(col(idCol),
        slice(col("_l"), lit(1), size(col("_l")) - 1).as("_a"),
        slice(col("_l"), lit(2), size(col("_l")) - 1).as("_b"))
      .select(col(idCol), explode(arrays_zip(col("_a"), col("_b"))).as("_p"))
      .select(col(idCol), col("_p._a").as("w1"), col("_p._b").as("w2"))

  /** Bigram-frequency model: (`w1`, `w2`, `n`) over adjacent token pairs. */
  def bigramFit(docs: DataFrame, textCol: Column): DataFrame =
    docs.where(graft.functions.has_min_tokens(textCol, 2))
      .select(TextFunctions.tokens(textCol).as("_l"))
      .select(slice(col("_l"), lit(1), size(col("_l")) - 1).as("_a"),
        slice(col("_l"), lit(2), size(col("_l")) - 1).as("_b"))
      .select(explode(arrays_zip(col("_a"), col("_b"))).as("_p"))
      .select(col("_p._a").as("w1"), col("_p._b").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))

  /** Score docs under a fitted bigram model: mean negative conditional
    * log-likelihood `-avg(ln(n(w1,w2) / n(w1,·)))` over the doc's
    * adjacent pairs (MLE, no smoothing — exact for a model fitted on the
    * scored corpus, where every doc bigram is in the model). Docs with
    * fewer than two tokens get a null `nll2`. Same scale shape as
    * [[unigramNll]]: the model and its left-marginal live on the
    * cluster; scoring is explode + two equi-joins + one groupBy. */
  def bigramNll(docs: DataFrame, model: DataFrame, idCol: String,
      textCol: Column): DataFrame = {
    // r10 note: the model is referenced twice (left marginal + score
    // join), so a lazy model re-runs its corpus subtree twice. A
    // localCheckpoint here was MEASURED SLOWER (q62: 0.20 s → 0.75 s):
    // the bigram model is distinct-pair-sized (~1M rows at sf0.1, far
    // bigger than a unigram vocabulary), so materializing it costs more
    // than the saved tokenize pass, and the checkpointed RDD loses the
    // size estimate that made the score join a broadcast. Left as-is.
    val leftCounts = model.groupBy("w1").agg(sum(col("n")).as("_c1"))
    val scored = bigramPairs(docs, idCol, textCol)
      .join(model, Seq("w1", "w2"))
      .join(leftCounts, Seq("w1"))
      .select(col(idCol),
        log(col("n").cast("double") / col("_c1").cast("double")).as("_lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        (-avg(col("_lp"))).as("nll2"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0)).as("n_bigrams"),
        col("nll2"))
  }

  /** Score docs under an interpolated Kneser-Ney bigram model — the
    * smoothing family behind the KenLM scorers CCNet-style pipelines use
    * for perplexity filtering (Kneser & Ney 1995; Chen & Goodman 1999),
    * which Laplace smoothing ([[unigramNll]]) approximates poorly: KN
    * backs off to a CONTINUATION probability (how many distinct contexts
    * a word follows) rather than raw frequency, so "Francisco" (frequent
    * but only after "San") stops looking like a likely unigram.
    *
    *   P(w2|w1) = (max(c(w1,w2) − D, 0) + D · N1+(w1,·) · Pcont(w2)) / c(w1,·)
    *   Pcont(w2) = N1+(·,w2) / |bigram types|
    *
    * with fixed discount `D` (the dyadic default 0.75 is exact in
    * binary). Backoff rules for transfer scoring: an unseen (w1, w2)
    * pair contributes only the continuation term; an unseen w2 takes
    * Pcont = 1/|types| (one phantom continuation); an unseen w1 drops
    * straight to Pcont(w2). Fitted-on-the-scored-corpus has no OOV and
    * every term is a ratio of exact integer counts, so the score replays
    * in an external engine (q106) with the same fixed operation order.
    *
    * Scale shape of the model statistics: three aggregations over the
    * bigram model (left marginal + distinct-continuation counts — all
    * vocabulary-sized) and ONE 1-row type-count read; scoring is the
    * q62 join shape. Returns (idCol, `n_bigrams`, `nll_kn`); docs with
    * fewer than two tokens get a null score.
    */
  def kneserNeyBigramNll(docs: DataFrame, model: DataFrame, idCol: String,
      textCol: Column, discount: Double = 0.75): DataFrame = {
    // r10 note: four model references here — but the bigram model is
    // distinct-pair-sized and a localCheckpoint was measured slower on
    // the same-shaped q62 join (see bigramNll), so the lazy recompute
    // stays.
    val types = model.count().toDouble // 1-row model-size read
    val left = model.groupBy("w1").agg(sum(col("n")).as("_c1"),
      countDistinct(col("w2")).cast("double").as("_n1p"))
    val cont = model.groupBy("w2")
      .agg(countDistinct(col("w1")).cast("double").as("_dl"))
    // fixed operation order, mirrored verbatim in the oracle:
    // (greatest(c12 − D, 0) + (D·n1p) · (dl/T)) / c1
    val pcont = coalesce(col("_dl"), lit(1.0)) / lit(types)
    val lp = when(col("_c1").isNotNull,
      log((greatest(coalesce(col("n").cast("double"), lit(0.0)) - lit(discount),
          lit(0.0)) + (lit(discount) * col("_n1p")) * pcont) / col("_c1")))
      .otherwise(log(pcont))
    val scored = bigramPairs(docs, idCol, textCol)
      .join(model, Seq("w1", "w2"), "left")
      .join(left, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .select(col(idCol), lp.as("_lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        (-avg(col("_lp"))).as("nll_kn"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0)).as("n_bigrams"),
        col("nll_kn"))
  }

  /** PMI collocation mining: the top bigrams whose observed frequency most
    * exceeds independence — `lift = P(w1 w2) / (P(w1) P(w2))` with all
    * probabilities estimated from token counts over one shared total `N`
    * (the standard simplification; the bigram-total/`N` factor it drops is
    * constant and rank-neutral, so the ordering equals PMI's).
    *
    * The score ships as `lift_ppm = floor(n12 · N · 10^6 / (n1 · n2))` —
    * exact 64-bit integer math, no float log anywhere, so the oracle
    * replays it bit-for-bit with HUGEINT division. The `N ≤ 3M tokens`
    * guard is the int64 overflow bound of that exactness trick
    * (`n12 ≤ N` ⇒ the numerator is < 2^63 whenever `N² · 10^6` is); a
    * 100 TB corpus mines collocations per-shard/per-source at this size
    * or ranks by the double-precision PMI instead — the pipeline shape
    * (two count aggregations, one vocab-sized equi-join, top-k) is
    * unchanged and scale-safe: the final order-by-limit plans as
    * TakeOrderedAndProject (per-partition heaps), never a global sort.
    *
    * Output: (`w1`, `w2`, `n12`, `n1`, `n2`, `lift_ppm`), the `topK` rows
    * by (`lift_ppm` desc, `w1`, `w2`) among bigrams with `n12 ≥ minCount`.
    */
  /** Shared count pipeline of both collocation variants: unigram model +
    * min-count-filtered bigram counts joined to their marginals —
    * (`uni`, joined (w1, w2, n12, n1, n2)). */
  private def collocCounts(docs: DataFrame, textCol: Column,
      minCount: Long): (DataFrame, DataFrame) = {
    val uni = unigramFit(docs, textCol)
    val n1 = uni.select(col("word").as("w1"), col("n").as("n1"))
    val n2 = uni.select(col("word").as("w2"), col("n").as("n2"))
    val joined = bigramFit(docs, textCol)
      .where(col("n") >= minCount)
      .select(col("w1"), col("w2"), col("n").as("n12"))
      .join(n1, Seq("w1")).join(n2, Seq("w2"))
    (uni, joined)
  }

  private def collocTopK(scored: DataFrame, scoreCol: String,
      topK: Int): DataFrame =
    scored.select(col("w1"), col("w2"), col("n12"), col("n1"), col("n2"),
      col(scoreCol))
      .orderBy(col(scoreCol).desc, col("w1"), col("w2"))
      .limit(topK)

  def collocations(docs: DataFrame, textCol: Column, minCount: Long = 5,
      topK: Int = 50): DataFrame = {
    val (uni, joined) = collocCounts(docs, textCol, minCount)
    // the N guard genuinely needs the total on the driver — this is the
    // one eager action in the exact variant (the unbounded
    // [[collocationsPmi]] stays fully lazy)
    val row = uni.agg(sum(col("n"))).head
    val nTok = if (row.isNullAt(0)) 0L else row.getLong(0)
    require(nTok <= 3000000L,
      s"collocations exact-ppm math needs N ≤ 3M tokens (got $nTok): " +
        "mine per-shard or rank by double PMI beyond that")
    collocTopK(joined.withColumn("lift_ppm",
      expr(s"(n12 * ${nTok}L * 1000000L) div (n1 * n2)")), "lift_ppm", topK)
  }

  /** Dunning log-likelihood-ratio collocations (1993) — the
    * significance-tested complement of [[collocations]]' PMI lift: PMI
    * overrates rare pairs (two hapaxes that co-occur once score
    * maximal lift), LLR weighs the evidence. Over the bigram
    * contingency table (k11 = n12, k12 = R−n12, k21 = C−n12,
    * k22 = N−R−C+n12; R/C/N = bigram row/column/total marginals):
    *
    *   llr = 2 · Σ_cells k · ln(k·N / (rowSum·colSum)),  k > 0 cells
    *
    * Every count is an exact integer; each cell's term is quantized
    * ONCE to ppb (the q123 fixed-chain rule — negative terms round
    * away from zero on both engines) and the 4-term sum is exact, so
    * `llr2_ppb` gates directly. One bigram aggregation + two
    * vocabulary-sized marginal joins + a broadcast 1-row total; the
    * minCount filter applies AFTER marginals (the filtered universe
    * stays the full corpus). Returns
    * (w1, w2, n12, rr, cc, nn, llr2_ppb). */
  def collocationsLlr(docs: DataFrame, textCol: Column,
      minCount: Long = 5): DataFrame = {
    val bc = bigramFit(docs, textCol)
    val r = bc.groupBy("w1").agg(sum("n").as("rr"))
    val c = bc.groupBy("w2").agg(sum("n").as("cc"))
    val tot = broadcast(bc.agg(sum("n").as("nn")))
    val base = bc.select(col("w1"), col("w2"), col("n").as("n12"))
      .where(col("n12") >= minCount)
      .join(r, Seq("w1")).join(c, Seq("w2")).crossJoin(tot)
    def term(k: Column, rowSum: Column, colSum: Column): Column =
      when(k > 0, round(lit(1e9) * k.cast("double") *
        log((k.cast("double") * col("nn").cast("double")) /
          (rowSum.cast("double") * colSum.cast("double")))).cast("long"))
        .otherwise(0L)
    base.withColumn("llr2_ppb",
        lit(2L) * (term(col("n12"), col("rr"), col("cc")) +
          term(col("rr") - col("n12"), col("rr"), col("nn") - col("cc")) +
          term(col("cc") - col("n12"), col("nn") - col("rr"), col("cc")) +
          term(col("nn") - col("rr") - col("cc") + col("n12"),
            col("nn") - col("rr"), col("nn") - col("cc"))))
      .select(col("w1"), col("w2"), col("n12"), col("rr"), col("cc"),
        col("nn"), col("llr2_ppb"))
  }

  /** [[collocations]]' scale path: identical count pipeline, ranked by
    * double-precision `pmi = ln(n12 · N / (n1 · n2))` with no overflow
    * bound — for corpora past the exact-ppm guard. Same deterministic
    * tie-break; the two variants order identically except where two
    * lifts collide within one double ulp. */
  def collocationsPmi(docs: DataFrame, textCol: Column, minCount: Long = 5,
      topK: Int = 50): DataFrame = {
    val (uni, joined) = collocCounts(docs, textCol, minCount)
    // total tokens as a broadcast 1-row aggregate, not a driver action:
    // the whole pipeline stays one lazy plan with a single corpus scan
    // per count table
    val tot = broadcast(uni.agg(sum(col("n")).cast("double").as("_N")))
    collocTopK(joined.crossJoin(tot)
      .withColumn("pmi", log(col("n12").cast("double") * col("_N") /
        (col("n1").cast("double") * col("n2").cast("double"))))
      .drop("_N"), "pmi", topK)
  }

  /** Windowed co-occurrence PMI — the word-ASSOCIATION statistic under
    * word-vector training (PPMI matrices are what SVD/GloVe-style
    * embeddings factor), where [[collocations]] scores ADJACENT bigrams
    * only. Every ordered pair of token occurrences within `window`
    * positions counts once per direction (the skip-gram convention, so
    * marginals are symmetric):
    *
    *   pmi(a,b) = ln( c_ab · T / (m_a · m_b) ),  T = Σ c_ab,
    *   m_w = Σ_b c_wb
    *
    * with c/m/T exact integers from one (a, b) pair aggregation and
    * `pmi_ppb` the single ln-of-ratio rounded once to ppb (the q123
    * fixed-chain rule — engine-replayable). Physical shape: positional
    * postings self-join per doc (O(len·window) rows, one doc-keyed
    * shuffle), pair groupBy with map-side combine, broadcast marginal
    * joins; never a vocabulary cross product. Output: (a, b, c_ab,
    * m_a, m_b, t, pmi_ppb) for pairs with c_ab >= minCount. */
  def cooccurrencePmi(docs: DataFrame, idCol: String, textCol: Column,
      window: Int, minCount: Long = 5L): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val toks = docs.select(col(idCol).as("_id"),
        posexplode(graft.functions.TextFunctions.tokens(textCol)))
      .toDF("_id", "_pos", "_w")
    val right = toks.select(col("_id").as("_id2"), col("_pos").as("_p2"),
      col("_w").as("_w2"))
    val pos = toks.join(right,
      col("_id") === col("_id2") &&
        col("_p2") > col("_pos") && col("_p2") <= col("_pos") + window)
    val directed = pos.select(explode(array(
        struct(col("_w").as("a"), col("_w2").as("b")),
        struct(col("_w2").as("a"), col("_w").as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val cab = directed.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val ma = cab.groupBy("a").agg(sum("c_ab").as("m_a"))
    val mb = cab.groupBy("b").agg(sum("c_ab").as("m_b"))
    val tot = broadcast(cab.agg(sum("c_ab").as("t")))
    // marginal joins key on the term; AQE broadcasts them when the
    // vocabulary is small and shuffles otherwise (a web-scale vocab
    // must not be forced onto the driver)
    cab.where(col("c_ab") >= minCount)
      .join(ma, "a").join(mb, "b")
      .crossJoin(tot)
      .withColumn("pmi_ppb",
        round(lit(1e9) * log(col("c_ab").cast("double") *
          col("t").cast("double") /
          (col("m_a").cast("double") * col("m_b").cast("double"))))
          .cast("long"))
      .select("a", "b", "c_ab", "m_a", "m_b", "t", "pmi_ppb")
  }

  /** Skip-gram (center, context) training-pair extraction with
    * Mikolov-style frequent-word subsampling — the word2vec data-prep
    * stage: occurrence t of word w survives with probability
    * min(1, sqrt(thr / f_w)), f_w = cnt_w / T, and pairs window over
    * the KEPT sequence (subsample-then-window, the word2vec order — so
    * dropping stopwords brings content words into each other's
    * windows). Both directions are emitted and aggregated to
    * (center, context, n_pairs).
    *
    * Determinized end-to-end: the keep threshold rides IEEE sqrt (the
    * q61 bit-parity rule) rounded once to ppm, and the per-OCCURRENCE
    * draw is splitmix64(id·2^20 + pos + seed) — so the surviving pair
    * table replays in an external engine. Positions are capped at 2^20
    * per doc (the key packing); a longer doc raises loudly.
    *
    * Scale shape: one count agg + broadcast total, a zero-shuffle keep
    * filter, one per-doc re-rank window (bounded by doc length), one
    * doc-keyed pair join, one pair groupBy — no vocabulary cross
    * product, no global sort. */
  def skipGramPairs(docs: DataFrame, idCol: String, textCol: Column,
      window: Int, thrPpm: Long = 1000L, seed: Long = 0L): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(thrPpm >= 1L, s"thrPpm must be >= 1, got $thrPpm")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("_id"),
        posexplode(graft.functions.TextFunctions.tokens(textCol)))
      .toDF("_id", "_pos", "_w")
    val cnt = toks.groupBy("_w").agg(count(lit(1)).as("_cnt"))
    val tot = broadcast(toks.agg(count(lit(1)).as("_T")))
    val key = when(col("_pos") < lit(1048576),
      shiftleft(col("_id"), 20) + col("_pos"))
      .otherwise(raise_error(lit(
        "skipGramPairs: doc exceeds 2^20 token positions")))
    val kept = toks.join(cnt, "_w").crossJoin(tot)
      .withColumn("_kp", least(lit(1000000L),
        round(lit(1000000.0) * sqrt(
          lit(thrPpm.toDouble / 1e6) * col("_T").cast("double") /
            col("_cnt").cast("double"))).cast("long")))
      .withColumn("_u", pmod(
        graft.functions.splitmix64_rank(key, seed), lit(1000000L)))
      .where(col("_u") < col("_kp"))
      .withColumn("_np", row_number().over(
        Window.partitionBy("_id").orderBy("_pos")))
    val r = kept.select(col("_id").as("_id2"), col("_np").as("_np2"),
      col("_w").as("_w2"))
    kept.join(r, col("_id") === col("_id2") &&
        col("_np2") > col("_np") && col("_np2") <= col("_np") + window)
      .select(explode(array(
        struct(col("_w").as("center"), col("_w2").as("context")),
        struct(col("_w2").as("center"), col("_w").as("context")))).as("p"))
      .select(col("p.center").as("center"), col("p.context").as("context"))
      .groupBy("center", "context").agg(count(lit(1)).as("n_pairs"))
  }

  /** SVD-PPMI word vectors (Levy & Goldberg 2014: skip-gram negative
    * sampling implicitly factorizes the shifted PPMI matrix — this is
    * the direct, deterministic route to the same geometry): build the
    * windowed PPMI matrix ([[cooccurrencePmi]], negatives clamped to
    * 0), eigendecompose it with the deterministic cyclic Jacobi (the
    * [[graft.operators.Jacobi]] PCA solver — PPMI is symmetric), and
    * embed word w as U[w, k] · sqrt(|λ_k|) over the top `dim` axes
    * (|λ| = the singular values of a symmetric matrix; Pca.fit's sign
    * and ordering conventions, so the fit is bit-reproducible).
    *
    * The distributed stage is the q194-gated count pipeline; only the
    * V×V PPMI matrix lands on the driver (the kmeans-centroid / BPE
    * guarded-driver-fit pattern — `maxVocab` refuses loudly). Fit on
    * the top-`maxVocab` corpus; vectors for the long tail come from
    * fold-in against these axes downstream. Returns (w, vec). */
  def wordVectors(docs: DataFrame, idCol: String, textCol: Column,
      window: Int, dim: Int, minCount: Long = 5L,
      maxVocab: Int = 2000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pairsDf = cooccurrencePmi(docs, idCol, textCol, window, minCount)
      .where(col("pmi_ppb") > 0L)
      .select("a", "b", "pmi_ppb")
    // guard BEFORE collecting: the pair table is O(vocab²) — a 1-row
    // count agg refuses loudly instead of materializing it on the driver
    val nVocab = pairsDf
      .select(explode(array(col("a"), col("b"))).as("w"))
      .agg(countDistinct(col("w"))).head.getLong(0)
    require(nVocab <= maxVocab,
      s"wordVectors driver fit needs vocab <= $maxVocab " +
        s"(got $nVocab): raise minCount or maxVocab")
    val ppmi = pairsDf.collect()
    val vocab = ppmi.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.sorted
    require(vocab.nonEmpty, "no co-occurring pairs above minCount")
    val d = vocab.length
    require(dim >= 1 && dim <= d, s"dim must be in [1, $d], got $dim")
    val idx = vocab.zipWithIndex.toMap
    val m = Array.ofDim[Double](d, d)
    ppmi.foreach { r =>
      m(idx(r.getString(0)))(idx(r.getString(1))) = r.getLong(2) / 1e9
    }
    val (eigVals, eigVecs) = Jacobi.eigSym(m)
    // top axes by |eigenvalue| (symmetric SVD), tie -> lower index
    val order = eigVals.indices
      .sortBy(k => (-math.abs(eigVals(k)), k)).take(dim)
    val axes = order.map { k =>
      val v = Array.tabulate(d)(j => eigVecs(j)(k))
      var j0 = 0; var j = 1
      while (j < d) { if (math.abs(v(j)) > math.abs(v(j0))) j0 = j; j += 1 }
      val s = math.sqrt(math.abs(eigVals(k)))
      if (v(j0) < 0) v.map(x => -x * s) else v.map(_ * s)
    }
    vocab.map(w => (w, axes.map(_(idx(w))).toArray))
      .toSeq.toDF("w", "vec")
  }

  /** [[unigramNll]] + decile-style quality buckets over ascending
    * (`nll`, id) — bucket 1 = most in-distribution, exact SQL `NTILE`
    * semantics (first `count % buckets` buckets take one extra row). The
    * (nll, id) composite makes the cut deterministic under duplicated
    * texts.
    *
    * NOT a window function: a global `ntile() OVER (ORDER BY …)` plans as
    * a single-partition sort — every row through one task. Instead the
    * global rank comes from range-partition + partition-local sort +
    * RDD `zipWithIndex` (two passes, no driver collect — the same shape
    * as [[GroupOps.rankVocabulary]]), and the rank→bucket map is
    * closed-form arithmetic. */
  def unigramBuckets(docs: DataFrame, model: DataFrame, idCol: String,
      textCol: Column, buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    require(buckets >= 1)
    // r10: the scored frame is consumed THREE times (the count here,
    // zipWithIndex's partition-size job, the final read) — without the
    // materialization each consumer re-ran the whole tokenize + model
    // join + aggregate pipeline. One row per doc, so the checkpoint is
    // output-sized; this function was already eager via the count.
    val scored = unigramNll(docs, model, idCol, textCol).localCheckpoint()
    val spark = scored.sparkSession
    val n = scored.count()
    val base = n / buckets
    val rem = (n % buckets).toInt
    val sorted = scored
      .repartitionByRange(col("nll").asc_nulls_last, col(idCol))
      .sortWithinPartitions(col("nll").asc_nulls_last, col(idCol))
    val schema = StructType(sorted.schema.fields :+
      StructField("bucket", IntegerType, nullable = false))
    val bucketed = sorted.rdd.zipWithIndex.map { case (r, rank) =>
      val cut = rem.toLong * (base + 1)
      val b = if (n < buckets) rank + 1 // degenerate: one row per bucket
        else if (rank < cut) rank / (base + 1) + 1
        else rem + (rank - cut) / base + 1
      Row.fromSeq(r.toSeq :+ b.toInt)
    }
    spark.createDataFrame(bucketed, schema)
  }

  /** Jensen–Shannon divergence between the unigram distributions of
    * every unordered group pair — the corpus-drift / domain-shift
    * monitor (0 = identical, ln 2 = disjoint support). The one-sided
    * vocabulary needs NO join: a term present only in A contributes
    * 0.5·p·ln 2, and those p's sum to 1 − (A's shared mass) — a closed
    * form over exact integer counts. So the only data-sized work is
    * ONE (group, token) count aggregation and ONE shared-vocabulary
    * self-join; the G² pair frame is a broadcast cross of the G-row
    * totals.
    *
    * Determinism: each shared term's contribution
    * 0.5·(p·ln(2p/(p+q)) + q·ln(2q/(p+q))) is a fixed-order double
    * rounded to ppb and summed as exact integers (order-free,
    * layout-invariant); shared masses are exact integer count sums
    * with one division each. Returns (ga, gb, n_a, n_b, ca_shared,
    * cb_shared, t_ppb_sum, js). */
  def jsDivergencePairs(docs: DataFrame, groupCol: String,
      textCol: Column): DataFrame = {
    val toks = docs.select(col(groupCol).as("_g"),
      explode(TextFunctions.tokens(textCol)).as("_w"))
    val cnt = toks.groupBy("_g", "_w").agg(count(lit(1)).as("_c"))
    val tot = cnt.groupBy("_g").agg(sum("_c").as("_n"))
    val a = cnt.select(col("_g").as("ga"), col("_w"), col("_c").as("_ca"))
    val b = cnt.select(col("_g").as("gb"), col("_w"), col("_c").as("_cb"))
    val na = broadcast(tot.select(col("_g").as("ga"), col("_n").as("n_a")))
    val nb = broadcast(tot.select(col("_g").as("gb"), col("_n").as("n_b")))
    val p = col("_ca").cast("double") / col("n_a").cast("double")
    val q = col("_cb").cast("double") / col("n_b").cast("double")
    val t = lit(0.5) * (p * log(lit(2.0) * p / (p + q)) +
      q * log(lit(2.0) * q / (p + q)))
    val shared = a.join(b, Seq("_w")).where(col("ga") < col("gb"))
      .join(na, Seq("ga")).join(nb, Seq("gb"))
      .withColumn("_t_ppb", round(t * lit(1e9)).cast("long"))
      .groupBy("ga", "gb")
      .agg(sum("_ca").as("ca_shared"), sum("_cb").as("cb_shared"),
        sum("_t_ppb").as("t_ppb_sum"))
    val pairs = na.crossJoin(nb).where(col("ga") < col("gb"))
    val half = lit(0.5) * log(lit(2.0))
    pairs.join(shared, Seq("ga", "gb"), "left")
      .select(col("ga"), col("gb"), col("n_a"), col("n_b"),
        coalesce(col("ca_shared"), lit(0L)).as("ca_shared"),
        coalesce(col("cb_shared"), lit(0L)).as("cb_shared"),
        coalesce(col("t_ppb_sum"), lit(0L)).as("t_ppb_sum"))
      .withColumn("js",
        col("t_ppb_sum").cast("double") / lit(1e9) +
          half * ((lit(1.0) -
              col("ca_shared").cast("double") / col("n_a").cast("double")) +
            (lit(1.0) -
              col("cb_shared").cast("double") / col("n_b").cast("double"))))
  }
  /** Chi-square term↔class association — the feature-selection table for
    * quality/domain classifiers (which n-grams discriminate the target
    * class; the fastText-seed selection step). Doc-level PRESENCE
    * statistics: each (doc, distinct term) pair contributes once, so the
    * 2×2 contingency per term is exact integers
    * (n11 = class docs containing the term, n10 = non-class docs
    * containing it, n01/n00 the complements against the class totals).
    *
    * chi2 = N·(n11·n00 − n10·n01)² / ((n11+n10)(n01+n00)(n11+n01)(n10+n00))
    * with the numerator's inner difference kept as an exact BIGINT
    * (`admbc` — also the association sign) and the final value one fixed
    * left-to-right double chain, NULL when a margin is empty.
    *
    * Scale: explode-distinct + one groupBy on term + a broadcast 1-row
    * totals join — the wordcount shape, no window, no driver state.
    */
  def termClassChi2(df: DataFrame, idCol: String, text: Column,
      cls: Column): DataFrame = {
    val base = df.where(text.isNotNull && cls.isNotNull)
      .select(col(idCol).as("_id"), cls.cast("boolean").as("_c"), text.as("_t"))
    val tok = base
      .select(col("_id"), col("_c"),
        explode(TextFunctions.tokenSet(col("_t"))).as("term"))
      .distinct()
    val tot = broadcast(base.agg(count(lit(1)).as("_n"),
      count(when(col("_c"), 1)).as("_np")))
    val tc = tok.groupBy("term")
      .agg(count(when(col("_c"), 1)).as("n11"),
        count(when(!col("_c"), 1)).as("n10"))
    val out = tc.crossJoin(tot)
      .withColumn("n01", col("_np") - col("n11"))
      .withColumn("n00", col("_n") - col("_np") - col("n10"))
      .withColumn("admbc",
        col("n11") * col("n00") - col("n10") * col("n01"))
    val r1 = col("n11") + col("n10")
    val r0 = col("n01") + col("n00")
    val c1 = col("n11") + col("n01")
    val c0 = col("n10") + col("n00")
    out.withColumn("chi2",
        when(r1 === 0 || r0 === 0 || c1 === 0 || c0 === 0, lit(null))
          .otherwise(
            col("_n").cast("double") * col("admbc") * col("admbc") /
              (r1.cast("double") * r0 * c1 * c0)))
      .select(col("term"), col("n11"), col("n10"), col("n01"), col("n00"),
        col("admbc"), col("chi2"))
  }

  // ------------------------------------------------------------------
  // Multinomial Naive Bayes: the classic TRAINABLE text classifier —
  // the in-cluster upgrade of the fixed-coefficient QualityClassifier
  // (q94) for language ID, domain routing, and quality labeling when
  // labeled data exists. Fit = ONE (label, word) count aggregation
  // (the model never leaves the cluster); every parameter is a
  // Laplace-smoothed ratio of exact integer counts whose ln is
  // quantized ONCE to ppb (the q172/q225 rule), so scoring — integer
  // weight sums + a deterministic argmax — is layout-invariant and
  // replayable bit-for-bit by an external engine.
  //
  // Scale shape: fit shuffles on (label, word) with map-side combine
  // (vocabulary-bounded output); scoring is one explode, one
  // label-grid crossJoin of a bounded L-row broadcast, one
  // vocabulary-sized weight join (AQE broadcasts it when it fits),
  // one groupBy(doc, label), one per-doc argmax window. No UDFs.
  // ------------------------------------------------------------------

  /** Fitted NB model: `classStats` = one row per label (label, n_docs,
    * n_tok, prior_ppb, unseen_ppb), `wordWeights` = (label, word,
    * w_ppb) for words SEEN with that label. */
  case class NaiveBayesModel(classStats: DataFrame, wordWeights: DataFrame)

  /** Train on (label, text): w(l, w) = ln((c_lw + 1) / (n_l + V)) with
    * V = the training vocabulary size (Laplace smoothing). Each ln
    * argument is ONE double division of exact integers (identical on
    * every IEEE engine), quantized once to ppb. `prior_ppb` =
    * ln(docs_l / docs) the same way; `unseen_ppb` is the c = 0 weight
    * (score-time words outside the training vocabulary use it too —
    * the standard "treat OOV as unseen" convention, documented). */
  def naiveBayesFit(docs: DataFrame, labelCol: Column,
      textCol: Column): NaiveBayesModel = {
    val ppb = (c: Column) => round(c * lit(1e9)).cast("long")
    val toks = docs.select(labelCol.as("label"),
        explode(TextFunctions.tokens(textCol)).as("word"))
      .where(col("label").isNotNull)
    val counts = toks.groupBy("label", "word").agg(count(lit(1)).as("c"))
    val vocab = counts.select(col("word")).distinct()
      .agg(count(lit(1)).as("v"))
    val perLabel = toks.groupBy("label").agg(count(lit(1)).as("n_tok"))
    val docCounts = docs.select(labelCol.as("label"))
      .where(col("label").isNotNull)
      .groupBy("label").agg(count(lit(1)).as("n_docs"))
    val totDocs = docCounts.agg(sum("n_docs").as("n_total"))
    val classStats = docCounts
      .join(perLabel, Seq("label"))
      .crossJoin(broadcast(totDocs)).crossJoin(broadcast(vocab))
      .select(col("label"), col("n_docs"), col("n_tok"),
        ppb(log(col("n_docs").cast("double") / col("n_total").cast("double")))
          .as("prior_ppb"),
        ppb(log(lit(1.0) / (col("n_tok") + col("v")).cast("double")))
          .as("unseen_ppb"))
    val wordWeights = counts
      .join(broadcast(perLabel), Seq("label"))
      .crossJoin(broadcast(vocab))
      .select(col("label"), col("word"),
        ppb(log((col("c") + 1L).cast("double") /
          (col("n_tok") + col("v")).cast("double"))).as("w_ppb"))
    NaiveBayesModel(classStats, wordWeights)
  }

  /** Score + classify: per (doc, label) the EXACT long sum of per-token
    * ppb weights (unseen/OOV tokens take the label's `unseen_ppb`)
    * plus the prior, then the (score desc, label asc) argmax. Docs
    * whose text tokenizes to nothing classify on priors alone.
    * Returns (idCol, `label_pred`, `n_tokens`, `score_ppb`). */
  def naiveBayesScore(docs: DataFrame, model: NaiveBayesModel,
      idCol: String, textCol: Column): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(textCol)).as("word"))
    val labels = model.classStats
      .select(col("label"), col("prior_ppb"), col("unseen_ppb"))
    val tokenSums = toks
      .crossJoin(broadcast(labels.select(col("label"), col("unseen_ppb"))))
      .join(model.wordWeights, Seq("label", "word"), "left")
      .groupBy(col(idCol), col("label"))
      .agg(count(lit(1)).as("_nt"),
        sum(coalesce(col("w_ppb"), col("unseen_ppb"))).as("_ws"))
    docs.select(col(idCol)).crossJoin(broadcast(labels))
      .join(tokenSums, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"),
        coalesce(col("_nt"), lit(0L)).as("n_tokens"),
        (coalesce(col("_ws"), lit(0L)) + col("prior_ppb")).as("score_ppb"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("score_ppb").desc, col("label").asc)))
      .where(col("_rn") === 1)
      .select(col(idCol), col("label").as("label_pred"),
        col("n_tokens"), col("score_ppb"))
  }

}
