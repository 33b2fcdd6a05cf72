package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus cleaning rule batteries from the public pretraining-pipeline
  * literature: the C4 line-level rules (Raffel et al. 2020, §2.2) and the
  * Gopher/MassiveText document-level rules (Rae et al. 2021, Table A1).
  *
  * The reference has no corpus-cleaning surface (its text mixins stop at
  * per-doc conversion); these are beyond-reference training-pipeline
  * operators in the same family as the repetition signals in
  * [[graft.functions.TextFunctions]].
  *
  * Scale shape: every rule is a per-row scalar over builtin expressions —
  * no shuffle, no UDF, the whole battery stays inside whole-stage codegen.
  * At 100 TB this is a map-only pass that rides whatever partitioning the
  * scan produced.
  */
object Quality {

  /** Words of one line: split on blank runs, empties dropped. (The line
    * rules deliberately use the raw-whitespace word definition, not the
    * alnum tokenizer — C4 counts "words" before any normalization.) */
  private def lineWords(l: Column): Column =
    filter(split(l, "[ \\t]+"), w => w =!= "")

  /** C4 line-level cleaning. Keeps a line iff it
    *  - ends in a terminal punctuation mark (`.` `!` `?` `"`),
    *  - has at least `minWordsPerLine` words, and
    *  - does not contain the word "javascript" (case-insensitive);
    * then keeps the document iff it
    *  - contains neither "lorem ipsum" (case-insensitive) nor `{`, and
    *  - retains at least `minKeptLines` lines.
    *
    * Output: input row + `n_lines`, `n_kept`, `keep`, `kept_text` (the
    * surviving lines re-joined with `\n`; empty string when none).
    */
  def c4Clean(df: DataFrame, textCol: Column,
      minWordsPerLine: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val ls = filter(split(textCol, "\n"), l => length(trim(l)) > 0)
    val kept = filter(ls, l =>
      rtrim(l).rlike("[.!?\"]$") &&
        size(lineWords(l)) >= minWordsPerLine &&
        !lower(l).contains("javascript"))
    val docOk = !lower(textCol).contains("lorem ipsum") &&
      !textCol.contains("{")
    df.withColumn("n_lines", size(ls))
      .withColumn("n_kept", size(kept))
      .withColumn("keep", docOk && size(kept) >= lit(minKeptLines))
      .withColumn("kept_text", when(col("keep"), array_join(kept, "\n"))
        .otherwise(lit("")))
  }

  /** C4's bad-words rule (Raffel et al. 2020 §2.2: drop any page
    * containing a word on a blocklist), generalized to any token list.
    * `keep` is true iff NO alnum token of the text appears in `words` —
    * one `arrays_overlap` against a broadcast literal array: map-only,
    * zero shuffle, whole-stage codegen at any corpus size. Null text is
    * dropped (keep = false), matching the rule's intent. The blocklist
    * is lowercased here to match the tokenizer's case folding — a
    * mixed-case entry can never match otherwise. */
  def blocklistKeep(text: Column, words: Seq[String]): Column =
    when(text.isNull, lit(false))
      .otherwise(!arrays_overlap(
        graft.functions.TextFunctions.tokens(text),
        array(words.map(w => lit(w.toLowerCase)): _*)))

  /** Filter battery form of [[blocklistKeep]]: input row + `keep`. */
  def blocklistFilter(df: DataFrame, textCol: Column,
      words: Seq[String]): DataFrame =
    df.withColumn("keep", blocklistKeep(textCol, words))

  /** Gopher/MassiveText quality rule battery. Emits one boolean per rule
    * plus the conjunction `keep`; metrics are rounded to 6 dp *before*
    * comparison so an oracle recomputing the same double math lands on
    * the same side of every threshold.
    *
    * Defaults are the published MassiveText values. `minWords`/`maxWords`
    * bound the token count; `requiredStopwords` is the published 8-word
    * list ("the, be, to, of, and, that, have, with").
    */
  /** Per-doc token (unigram) Shannon entropy in nats — the gibberish /
    * boilerplate signal (natural prose sits in a band; repeated-token
    * spam collapses toward 0, random-unique-token noise rises to
    * ln(n)). The AGGREGATION-path twin of the per-row scalar
    * [[graft.functions.TextFunctions.tokenEntropy]] (q88): use the
    * scalar when entropy is the only signal (one codegen'd pass, no
    * shuffle); use this form when the (id, token) count table is being
    * built anyway (it shares that aggregation) or when the exact
    * integer gate matters — each term −(c/n)·ln(c/n) is a fixed-order
    * double rounded to ppb and summed as exact integers per doc, so
    * the table is layout-invariant and hash-gateable (the q123 JS
    * rule). Returns (idCol, n_tokens, n_distinct, h_ppb_sum, entropy).
    * Docs with no tokens report 0. */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: Column): DataFrame = {
    val toks = df.select(col(idCol).as("_id"),
      explode(TextFunctions.tokens(textCol)).as("_w"))
    val cnt = toks.groupBy("_id", "_w").agg(count(lit(1)).as("_c"))
    val tot = cnt.groupBy("_id").agg(sum("_c").as("_n"),
      count(lit(1)).as("n_distinct"))
    val p = col("_c").cast("double") / col("_n").cast("double")
    val scored = cnt.join(tot, Seq("_id"))
      .withColumn("_t_ppb", round((-p * log(p)) * lit(1e9)).cast("long"))
      .groupBy("_id")
      .agg(sum("_t_ppb").as("h_ppb_sum"))
    val base = df.select(col(idCol).as("_id"))
    base.join(tot, Seq("_id"), "left").join(scored, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("_n"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("h_ppb_sum"), lit(0L)).as("h_ppb_sum"))
      .withColumn("entropy", col("h_ppb_sum").cast("double") / lit(1e9))
  }

  def gopherQuality(df: DataFrame, textCol: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9, maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      minDistinctStopwords: Int = 2,
      maxDupLineFrac: Double = 0.3,
      maxTopWordFrac: Double = 0.2,
      maxTopBigramFrac: Double = 0.18,
      requiredStopwords: Seq[String] = Seq("the", "be", "to", "of", "and",
        "that", "have", "with")): DataFrame = {
    val n = TextFunctions.tokenCount(textCol)
    val r = (c: Column) => round(c, 6)
    val out = df
      .withColumn("ok_words", n >= minWords && n <= maxWords)
      .withColumn("ok_word_len",
        r(TextFunctions.meanTokenLength(textCol))
          .between(minMeanWordLen, maxMeanWordLen))
      // every gopher_aux_stats call carries the SAME stopword list so
      // codegen CSE collapses the battery to one fused line/word walk
      // (a Nil-list call beside the stopword call would be a second
      // GopherAuxStats instance — two walks per row)
      .withColumn("ok_symbols",
        r(TextFunctions.symbolWordRatio(textCol, requiredStopwords))
          <= maxSymbolWordRatio)
      .withColumn("ok_bullets",
        r(TextFunctions.bulletLineFrac(textCol, requiredStopwords))
          <= maxBulletLineFrac)
      .withColumn("ok_ellipsis",
        r(TextFunctions.ellipsisLineFrac(textCol, requiredStopwords))
          <= maxEllipsisLineFrac)
      .withColumn("ok_alpha",
        r(TextFunctions.alphaWordFrac(textCol, requiredStopwords))
          >= minAlphaWordFrac)
      .withColumn("ok_stopwords",
        TextFunctions.distinctStopwordCount(textCol, requiredStopwords)
          >= minDistinctStopwords)
      .withColumn("ok_dup_lines",
        r(TextFunctions.dupLineFrac(textCol, requiredStopwords))
          <= maxDupLineFrac)
      .withColumn("ok_top_word",
        r(TextFunctions.topWordFrac(textCol)) <= maxTopWordFrac)
      .withColumn("ok_top_bigram",
        r(TextFunctions.topBigramFrac(textCol)) <= maxTopBigramFrac)
    out.withColumn("keep",
      Seq("ok_words", "ok_word_len", "ok_symbols", "ok_bullets",
        "ok_ellipsis", "ok_alpha", "ok_stopwords", "ok_dup_lines",
        "ok_top_word", "ok_top_bigram").map(col).reduce(_ && _))
  }

  /** Benford first-digit forensics over a positive integer measure —
    * the fabricated-/templated-data smell test (organic magnitudes
    * follow log-uniform leading digits; synthetic uniform generators,
    * copy-paste and capped fields don't). The first digit comes from
    * the INTEGER's decimal string (portable across engines — never
    * from float formatting); observed counts are exact; expected
    * p_d = ln(1+1/d)/ln(10) and the per-digit χ² contribution
    * (obs − n·p)²/(n·p) are fixed float chains reported as rounded
    * integer columns (ppb / micro). One groupBy over ≤ 9 keys.
    * Returns (digit, obs, exp_ppb, contrib_micro). */
  def benfordDigits(df: DataFrame, positiveInt: Column): DataFrame = {
    val d = df.select(positiveInt.cast("long").as("_c"))
      .where(col("_c").isNotNull && col("_c") > 0L)
      .select(substring(col("_c").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("obs"))
    val tot = d.agg(sum("obs").as("_n"))
    val p = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
      log(lit(10.0))
    val diff = col("obs").cast("double") - col("_n").cast("double") * p
    d.crossJoin(broadcast(tot))
      .withColumn("exp_ppb", round(p * 1e9).cast("long"))
      .withColumn("contrib_micro",
        round(diff * diff / (col("_n").cast("double") * p) * 1e6)
          .cast("long"))
      .select("digit", "obs", "exp_ppb", "contrib_micro")
  }

  /** k-anonymity group profile (Sweeney 2002): one row per distinct
    * quasi-identifier combination with its population `n`, the
    * re-identification flag `at_risk` = (n < k), and — when
    * `sensitiveCol` is given — `n_sensitive` distinct sensitive values
    * (the l-diversity readout: a group with n >= k but n_sensitive = 1
    * still leaks the attribute). NULL is a QI value like any other
    * (standard SQL grouping), so incomplete records form their own
    * cohort instead of vanishing from the risk report.
    *
    * A release gate before training data leaves a tenant boundary —
    * the privacy twin of the PII scrubbers (`redactPii`/`redact_cards`),
    * which clean VALUES while this measures STRUCTURE. One hash
    * aggregation, map-side combined; at 100 TB the output is bounded by
    * the QI-combination cardinality, never the row count. */
  def kAnonymityGroups(df: DataFrame, qiCols: Seq[String], k: Long,
      sensitiveCol: Option[String] = None): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    val aggs = count(lit(1)).as("n") +:
      sensitiveCol.map(c => countDistinct(col(c)).as("n_sensitive")).toSeq
    df.groupBy(qiCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("at_risk", (col("n") < k).cast("int"))
  }

  /** One-row k-anonymity summary over [[kAnonymityGroups]]: the dataset
    * IS k'-anonymous for k' = `k_anonymity` (the smallest cohort), and
    * `at_risk_rows` individuals sit in cohorts smaller than `k`. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame =
    kAnonymityGroups(df, qiCols, k)
      .agg(sum("n").as("n_rows"), count(lit(1)).as("n_groups"),
        sum(when(col("at_risk") === 1, col("n")).otherwise(0L))
          .as("at_risk_rows"),
        sum(col("at_risk").cast("long")).as("at_risk_groups"),
        min("n").as("k_anonymity"))

  /** t-closeness (Li, Li & Venkatasubramanian, ICDE 2007) over an
    * ORDERED sensitive attribute — the privacy gate
    * [[kAnonymityGroups]]' l-diversity readout can't express: a cohort
    * whose sensitive DISTRIBUTION differs sharply from the population's
    * leaks (all-high salaries in one cohort is a disclosure even with
    * many distinct values). Per QI cohort, the ordered-EMD distance to
    * the global distribution with the paper's 1/(m−1) adjacent-value
    * metric: t_g = Σᵢ|cumₚ(i) − cum_q(i)| /(m−1) over the m global
    * distinct values, computed on the common denominator n_g·N so the
    * numerator Σ|cum_g·N − cum_all·n_g| is an EXACT Decimal(38,0)
    * integer and t is ONE division. Bucketize an unbounded sensitive
    * measure upstream (deciles, bands — m is the grid).
    *
    * Scale shape: the cohort frame crossJoins the broadcast m-row
    * global grid (cohorts × m rows — m is bucket-sized by contract),
    * cums are cohort-partitioned windows over m rows. Returns one row
    * per cohort: (qi…, n_g, m, emd_num decimal, t — null when m < 2). */
  def tCloseness(df: DataFrame, qiCols: Seq[String],
      sensitive: Column): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val base = df.select(qiCols.map(col) :+
        sensitive.cast("long").as("_v"): _*)
      .where(col("_v").isNotNull)
    val global = base.groupBy("_v").agg(count(lit(1)).as("_cv"))
    val tot = global.agg(sum("_cv").as("_N"), count(lit(1)).as("_m"))
    val cohorts = base.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_g"))
    val gv = base.groupBy(qiCols.map(col) :+ col("_v"): _*)
      .agg(count(lit(1)).as("_cgv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols.map(col): _*).orderBy(col("_v"))
    cohorts.crossJoin(broadcast(global))
      .join(gv, qiCols :+ "_v", "left")
      .withColumn("_cgv", coalesce(col("_cgv"), lit(0L)))
      .withColumn("_cumg", sum("_cgv").over(w))
      .withColumn("_cuma", sum("_cv").over(w))
      .crossJoin(broadcast(tot))
      .groupBy(qiCols.map(col) :+ col("n_g") :+ col("_N") :+ col("_m"): _*)
      .agg(coalesce(sum(abs(col("_cumg").cast("decimal(19,0)") * col("_N") -
          col("_cuma").cast("decimal(19,0)") * col("n_g"))),
        lit(0L).cast("decimal(38,0)")).as("emd_num"))
      .withColumn("t",
        when(col("_m") > 1L, col("emd_num").cast("double") /
          (col("n_g").cast("double") * col("_N").cast("double") *
            (col("_m") - 1L).cast("double"))))
      .select(qiCols.map(col) :+ col("n_g") :+ col("_m").as("m") :+
        col("emd_num") :+ col("t"): _*)
  }

  /** l-diversity (Machanavajjhala et al. 2007) per QI cohort — BOTH
    * published strengthenings of the distinct-count readout
    * [[kAnonymityGroups]] already carries:
    *
    *  - entropy l-diversity: H(cohort sensitive distribution) ≥ ln(l),
    *    with H = Σ −(c/n)·ln(c/n) computed per (cohort, value) as ONE
    *    short float chain quantized ONCE to ppb (the mutualInfo rule)
    *    and summed exactly; the ln(l) threshold is quantized the same
    *    way, so the verdict is an integer comparison.
    *  - recursive (c,l)-diversity: r₁ < c·(r_l + … + r_m) over the
    *    DESCENDING frequency ranks — pure exact integers end to end.
    *
    * Scale shape: one (qi, value) count aggregation (map-side combined,
    * output bounded by cohorts × sensitive domain), per-cohort windows
    * over the VALUE GRID (bounded by contract — bucketize an unbounded
    * sensitive attribute upstream), never over rows. NULL sensitive
    * values are excluded (they are absence, not a value to protect).
    *
    * Returns one row per cohort: (qi…, n_g, n_distinct, r1, tail_l,
    * recursive_ok, h_ppb, entropy_ok). */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitive: Column,
      l: Int, c: Long = 1L): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    require(c >= 1, s"c must be >= 1, got $c")
    val ppb = (x: Column) => round(x * lit(1e9)).cast("long")
    val vc = df.select(qiCols.map(col) :+ sensitive.as("_v"): _*)
      .where(col("_v").isNotNull)
      .groupBy(qiCols.map(col) :+ col("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols.map(col): _*)
      .orderBy(col("_c").desc, col("_v").asc)
    val lnThresholdPpb = math.round(math.log(l.toDouble) * 1e9)
    vc.withColumn("_rk", row_number().over(wRank))
      .withColumn("_n", sum("_c").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(qiCols.map(col): _*)))
      .withColumn("_h", ppb(-(col("_c").cast("double") / col("_n").cast("double")) *
        log(col("_c").cast("double") / col("_n").cast("double"))))
      .groupBy(qiCols.map(col): _*)
      .agg(max(col("_n")).as("n_g"),
        count(lit(1)).as("n_distinct"),
        max(when(col("_rk") === 1, col("_c"))).as("r1"),
        coalesce(sum(when(col("_rk") >= l, col("_c"))), lit(0L)).as("tail_l"),
        sum(col("_h")).as("h_ppb"))
      .withColumn("recursive_ok", col("r1") < lit(c) * col("tail_l"))
      .withColumn("entropy_ok", col("h_ppb") >= lit(lnThresholdPpb))
      .select(qiCols.map(col) :+ col("n_g") :+ col("n_distinct") :+
        col("r1") :+ col("tail_l") :+ col("recursive_ok") :+
        col("h_ppb") :+ col("entropy_ok"): _*)
  }

  /** Order-invariant dataset fingerprint: one row of (n_rows, xor64,
    * sum_lo) over the engine-portable splitmix64(fnv64(key)) row hash —
    * the reproducibility / cache-invalidation artifact ("is this
    * EXACTLY the table I trained on"). XOR and the low-31-bit sum are
    * both commutative (layout-invariant) and complementary: XOR alone
    * is blind to duplicated pairs, the (sum, count) pair is not. ONE
    * map-side-combined aggregation; fingerprints of disjoint shards
    * combine (xor, +, +). `key` should be a canonical string of the
    * identifying columns. */
  def fingerprint(df: DataFrame, key: Column): DataFrame =
    df.select(graft.operators.Sketch.keyHash(key).as("_h"))
      .where(col("_h").isNotNull)
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(_h)").as("xor64"),
        sum(col("_h").bitwiseAND(lit(0x7FFFFFFFL))).as("sum_lo"))

  /** Column-level profile: one row per named column with exact
    * (n, n_null, n_distinct) and min/max rendered as strings (profile
    * integer/string/date columns; a raw double's string form is
    * engine-specific — bucketize first). One aggregation per column
    * over a column-pruned scan — the scan reads ONLY the profiled
    * columns, and each agg map-side combines. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    cols.map { c =>
      df.agg(count(lit(1)).as("n"),
          sum(col(c).isNull.cast("long")).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_s"),
          max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("column"), col("n"), col("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_.unionByName(_))
  }

  /** Profile DIFF between two snapshots — the schema/content drift
    * report a nightly pipeline runs before promotion (the column-level
    * twin of [[graft.operators.Dedup.snapshotDiff]]'s row-level
    * churn): per column, both profiles side by side plus change flags.
    * Columns are compared by NAME (full outer — added/removed columns
    * surface as null sides). */
  def profileDiff(oldDf: DataFrame, newDf: DataFrame,
      cols: Seq[String]): DataFrame = {
    val po = profile(oldDf, cols.filter(oldDf.columns.contains))
      .select(col("column"), col("n").as("n_old"),
        col("n_null").as("n_null_old"), col("n_distinct").as("n_distinct_old"),
        col("min_s").as("min_old"), col("max_s").as("max_old"))
    val pn = profile(newDf, cols.filter(newDf.columns.contains))
      .select(col("column"), col("n").as("n_new"),
        col("n_null").as("n_null_new"), col("n_distinct").as("n_distinct_new"),
        col("min_s").as("min_new"), col("max_s").as("max_new"))
    po.join(pn, Seq("column"), "full_outer")
      .withColumn("range_changed",
        !(col("min_old") <=> col("min_new")) ||
          !(col("max_old") <=> col("max_new")))
      .withColumn("distinct_changed",
        !(col("n_distinct_old") <=> col("n_distinct_new")))
  }

  /** Data-contract expectations — the nightly validation report a
    * 100 TB pipeline runs before promoting a snapshot: each named
    * row-level rule is checked in ONE conditional-sum pass (a rule
    * evaluating to NULL counts as a violation — an unverifiable row is
    * a failing row), and the per-rule (rule, n, violations) report
    * stacks out of the single aggregate. Exact integers, map-side
    * combined, no second scan per rule. */
  def expectRows(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectRows needs >= 1 rule")
    val aggs = count(lit(1)).as("_n") +: rules.zipWithIndex.map {
      case ((_, c), i) =>
        coalesce(sum(when(!coalesce(c, lit(false)), 1L).otherwise(0L)),
          lit(0L)).as(s"_v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.zipWithIndex.map { case ((name, _), i) =>
      one.select(lit(name).as("rule"), col("_n").as("n"),
        col(s"_v$i").as("violations"))
    }
    stacked.reduce(_ unionByName _)
  }

  /** Uniqueness expectation: violations = rows beyond the first per
    * key (duplicate mass, not duplicate-key count). Null keys count
    * as a key value. */
  def expectUnique(df: DataFrame, cols: Seq[String],
      rule: String = "unique"): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("_c"))
      .agg(coalesce(sum("_c"), lit(0L)).as("n"),
        coalesce(sum(col("_c") - 1L), lit(0L)).as("violations"))
      .select(lit(rule).as("rule"), col("n"), col("violations"))

  /** Referential-integrity expectation: violations = child rows whose
    * key has no parent (null keys violate — same unverifiable-row rule
    * as [[expectRows]]). ONE left-outer join + aggregate, lazy. */
  def expectForeignKey(child: DataFrame, key: Column,
      parent: DataFrame, parentKey: Column,
      rule: String = "foreign_key"): DataFrame = {
    val c = child.select(key.as("_k"))
    val p = parent.select(parentKey.as("_pk")).where(col("_pk").isNotNull)
      .distinct()
    c.join(p, c("_k") === p("_pk"), "left_outer")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("_pk").isNull, 1L).otherwise(0L)), lit(0L))
          .as("violations"))
      .select(lit(rule).as("rule"), col("n"), col("violations"))
  }

  /** Shuffle-skew diagnostics over a grouping key — the pre-flight
    * report that decides salting / AQE skew-join / broadcast BEFORE a
    * 100 TB `groupBy`/`join` on that key: exact per-key counts, the
    * `topN` heaviest keys with their exact ppm share of all rows, and
    * the dataset totals (total rows, distinct keys) on every row for
    * context. Multi-column keys are joined with `"|"` (nulls read as
    * empty — the concat_ws rule; disambiguate upstream if '|' can
    * occur in values).
    *
    * Scale shape: ONE map-side-combined groupBy count over the key,
    * then top-N as a TakeOrdered (bounded per-partition heaps — never
    * a global sort shuffle) and a broadcast one-row total; the final
    * rank window runs over the ≤ topN selected rows only. Ties break
    * by key ascending, so the report is layout- and engine-stable.
    * Returns (rank, key, cnt, share_ppm, total, n_keys). */
  def skewReport(df: DataFrame, keyCols: Seq[String],
      topN: Int): DataFrame = {
    require(keyCols.nonEmpty, "skewReport needs >= 1 key column")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    import org.apache.spark.sql.expressions.Window
    val key = concat_ws("|", keyCols.map(c => col(c).cast("string")): _*)
    val counts = df.select(key.as("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      coalesce(sum("cnt"), lit(0L)).as("total"),
      count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("cnt").desc, col("key").asc).limit(topN)
    top.crossJoin(broadcast(stats))
      .withColumn("share_ppm", expr("cnt * 1000000 div total"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("key").asc)))
      .select("rank", "key", "cnt", "share_ppm", "total", "n_keys")
  }

  /** Value-inclusion profile between two columns — the join-key /
    * foreign-key DISCOVERY statistic for a lake of undocumented
    * tables (where [[expectForeignKey]] VERIFIES a declared key, this
    * measures candidate pairs): distinct cardinalities of both sides,
    * the shared-value count, and both containment coefficients
    * |A∩B|/|A| and |A∩B|/|B| as exact ppm — a pair with
    * incl_a_ppm ≈ 1e6 is "every value of A appears in B", the FK
    * signature. Nulls are excluded from both sides (a null never
    * joins).
    *
    * Scale shape: two distinct aggregations + one distinct-level
    * equi-join — O(distinct values), never O(rows); all counts exact
    * integers, the ppm a floor division. Returns one row
    * (n_a, n_b, n_shared, incl_a_ppm, incl_b_ppm). */
  def inclusion(dfA: DataFrame, colA: Column,
      dfB: DataFrame, colB: Column): DataFrame = {
    val a = dfA.select(colA.cast("string").as("_v"))
      .where(col("_v").isNotNull).distinct()
    val b = dfB.select(colB.cast("string").as("_v"))
      .where(col("_v").isNotNull).distinct()
    val na = a.agg(count(lit(1)).as("n_a"))
    val nb = b.agg(count(lit(1)).as("n_b"))
    val shared = a.join(b, "_v").agg(count(lit(1)).as("n_shared"))
    na.crossJoin(nb).crossJoin(shared)
      .withColumn("incl_a_ppm", when(col("n_a") > 0L,
        expr("n_shared * 1000000 div n_a")).otherwise(lit(0L)))
      .withColumn("incl_b_ppm", when(col("n_b") > 0L,
        expr("n_shared * 1000000 div n_b")).otherwise(lit(0L)))
  }

  /** Raw-deflate byte length of a string's UTF-8 bytes — the codec
    * behind [[compressionSignals]]. A UDF by necessity: the JVM
    * Deflater IS the codec, the same boundary as the image/audio
    * codecs in [[Multimodal]]. Raw deflate (nowrap), level 6 — no
    * gzip/zlib header, whose fixed bytes would bias short documents.
    * Null in → null out. */
  private[graft] val deflateLen = udf { (s: String) =>
    if (s == null) null.asInstanceOf[java.lang.Long]
    else {
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val d = new java.util.zip.Deflater(6, true)
      try {
        d.setInput(bytes); d.finish()
        val buf = new Array[Byte](8192)
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        java.lang.Long.valueOf(n)
      } finally d.end()
    }
  }

  /** Compression-ratio quality signal (the zlib repetitiveness test
    * real pretraining pipelines run beside the Gopher battery): text
    * that deflates far below typical prose is template/boilerplate/
    * repetition-heavy, text that barely deflates is noise or embedded
    * binary — both ends are removal candidates. Appends raw_bytes
    * (UTF-8 length), deflate_bytes, and ratio_ppm = deflate·10⁶ div
    * raw (floor; null for null/empty text — an empty document has no
    * ratio). Typical English prose lands ~300k–500k ppm at level 6;
    * filter tails per-corpus, not by a universal constant.
    *
    * Scale shape: map-only, zero shuffle — one codec call per row.
    * Byte lengths are exact for a given zlib build but NOT pinned
    * across zlib versions, so this signal is spec- and bench-covered,
    * never hash-gated cross-engine (the documented boundary: same
    * class as the image codecs' pixel output). */
  def compressionSignals(df: DataFrame, text: Column): DataFrame = {
    val raw = octet_length(text).cast("long")
    df.withColumn("raw_bytes", raw)
      .withColumn("deflate_bytes", when(raw > 0L, deflateLen(text)))
      .withColumn("ratio_ppm", when(raw > 0L,
        expr("deflate_bytes * 1000000L div raw_bytes")))
  }

  /** Seeded-Laplace differentially-private group counts — the release
    * mechanism for sharing per-cohort statistics off a sensitive
    * corpus: noisy_n = n + round(b·L⁻¹(u)) with Laplace scale
    * b = sensitivity/ε and L⁻¹(u) = −sign(u−½)·ln(1−2|u−½|). The
    * uniform is the GATED splitmix draw of the group key
    * (u = splitmix64(key+seed) mod 10⁹, the [[Evaluate
    * .poissonBootstrap]] chain — key ≥ 0 in-plan refusal), so the
    * mechanism is reproducible AND engine-replayable: b comes from the
    * same integer literals on both engines, the inverse-CDF is ONE
    * fixed float chain, and the noise rounds once to an integer.
    * Deterministic seeding is the standard reproducible-pipeline
    * trade-off (a fresh seed per release restores the formal DP
    * guarantee; the seed is part of the privacy budget discipline,
    * documented, not hidden). `noisy_n` clamps at 0 (post-processing —
    * DP-safe). One hash aggregation + a map stage over group rows.
    * Returns (key, n, u_ppb, noise, noisy_n). */
  def dpNoisyCounts(df: DataFrame, key: Column, epsilonPpm: Long,
      seed: Long = 0L, sensitivity: Long = 1L): DataFrame = {
    require(epsilonPpm > 0L && epsilonPpm <= 100000000L,
      s"epsilonPpm must be in (0, 1e8], got $epsilonPpm")
    require(sensitivity >= 1L,
      s"sensitivity must be >= 1, got $sensitivity")
    val grp = df.select(key.cast("long").as("key"))
      .where(col("key").isNotNull)
      .withColumn("key", when(col("key") >= 0L, col("key"))
        .otherwise(raise_error(concat(
          lit("dpNoisyCounts: key must be >= 0 (splitmix gate): "),
          col("key").cast("string")))))
      .groupBy("key").agg(count(lit(1)).as("n"))
    val u = pmod(graft.functions.splitmix64_rank(col("key"), seed),
      lit(1000000000L))
    val t = (col("u_ppb").cast("double") - 4.999999995e8) / 1.0e9
    val b = lit(sensitivity.toDouble) * 1000000.0 /
      lit(epsilonPpm.toDouble)
    val noise = round(lit(0.0) - b * signum(t) *
      log(lit(1.0) - abs(t) * 2.0)).cast("long")
    grp.withColumn("u_ppb", u)
      .withColumn("noise", noise)
      .withColumn("noisy_n", greatest(lit(0L), col("n") + col("noise")))
  }
}
