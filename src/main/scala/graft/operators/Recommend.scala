package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collaborative-filtering primitives over an interaction table — the
  * recommendation tier the reference's match/find surface stops short
  * of (reference: docarray/array/mixins/match.py finds by CONTENT
  * similarity; these operators find by BEHAVIOR co-occurrence).
  * Everything is engine-replayable: exact integer co-counts, similarity
  * and factor values quantized ONCE per chain, windows partitioned by
  * user — never global.
  */
object Recommend {

  /** Item-item collaborative filtering — the classic Amazon-style
    * recommender: two items are similar when the same users touch
    * both (cosine over the binary user-item matrix,
    * sim(i,j) = c_ij/√(c_i·c_j)), and a user's score for a candidate
    * item is the sum of its similarities to the items they already
    * have. Scale shape mirrors [[GroupOps.basketPairs]]: distinct
    * (user, item) pairs, users with more than `maxUserItems` items
    * DROP ENTIRELY (the blowup valve — the kept universe stays
    * consistent across counts and pairs; a 10⁶-item user contributes
    * 10¹² pairs and no signal), the co-count table is one self-equi-
    * join on user + groupBy (kept symmetric, both (i,j) and (j,i), so
    * scoring is a plain equi-join), `minSupport` prunes the noise
    * tail, and `simTopK` caps each item's NEIGHBORHOOD at its top-K
    * most similar items (the standard item-kNN model size, and the
    * scale valve that bounds the scoring join at interactions×K rows —
    * without it a dense sim table makes scoring
    * O(interactions × items), measured 340 s at 1M×2k in the r7
    * bench). sim_ppm = round(10⁶·c_ij/√(c_i·c_j)) is ONE float chain
    * rounded once, so the per-user candidate score Σ sim_ppm is an
    * EXACT integer sum (order-free); owned items drop via left_anti;
    * the neighborhood cut and the per-user top-N are (−sim/−score,
    * item) row_numbers over PARTITIONED windows — deterministic,
    * never a global sort.
    *
    * Returns (user, item, score_ppm, n_contrib, rn) — rn 1..topN. */
  def itemItemRecs(df: DataFrame, userCol: String, itemCol: String,
      topN: Int = 10, minSupport: Long = 2L,
      maxUserItems: Int = 1000, simTopK: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topN >= 1, s"topN must be >= 1, got $topN")
    require(simTopK >= 1, s"simTopK must be >= 1, got $simTopK")
    val ui = df.select(col(userCol).as("_u"), col(itemCol).as("_i"))
      .where(col("_u").isNotNull && col("_i").isNotNull)
      .distinct()
    val sizes = ui.groupBy("_u").agg(count(lit(1)).as("_sz"))
    val kept = ui.join(sizes.where(col("_sz") <= maxUserItems)
      .select("_u"), Seq("_u"), "left_semi")
    val itemCnt = kept.groupBy("_i").agg(count(lit(1)).as("_cnt"))
    val co = kept.select(col("_u"), col("_i").as("a"))
      .join(kept.select(col("_u"), col("_i").as("b")), Seq("_u"))
      .where(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("_co"))
      .where(col("_co") >= minSupport)
    val sims = co
      .join(itemCnt.select(col("_i").as("a"), col("_cnt").as("_ca")),
        Seq("a"))
      .join(itemCnt.select(col("_i").as("b"), col("_cnt").as("_cb")),
        Seq("b"))
      .select(col("a"), col("b"),
        round(col("_co").cast("double") * 1e6 /
          sqrt(col("_ca").cast("double") * col("_cb").cast("double")))
          .cast("long").as("_sim_ppm"))
      .withColumn("_nrk", row_number().over(Window.partitionBy("a")
        .orderBy(col("_sim_ppm").desc, col("b").asc)))
      .where(col("_nrk") <= simTopK)
      .drop("_nrk")
    val scored = kept.select(col("_u"), col("_i").as("a"))
      .join(sims, Seq("a"))
      .groupBy(col("_u"), col("b"))
      .agg(sum("_sim_ppm").as("score_ppm"),
        count(lit(1)).as("n_contrib"))
      .join(kept.select(col("_u"), col("_i").as("b")),
        Seq("_u", "b"), "left_anti")
    val w = Window.partitionBy("_u")
      .orderBy(col("score_ppm").desc, col("b").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= topN)
      .select(col("_u").as("user"), col("b").as("item"),
        col("score_ppm"), col("n_contrib"), col("rn"))
  }

  /** The persistable model state behind [[itemItemRecs]] — exact
    * symmetric co-counts plus per-item counts in ONE frame
    * (b = null row carries the item count; b set carries the pair
    * count), so the artifact parquets as one table and
    * [[coCountsMerge]] is one groupBy-sum. The 100 TB point: co-counts
    * are ADDITIVE across USER-DISJOINT interaction batches (a user's
    * whole item set must live in one batch — the contract, enforced
    * nowhere cheaper than the ingest layout, documented loudly), so a
    * daily model update is one delta build + one merge instead of a
    * full-corpus rebuild — the [[graft.operators.Dedup]] incremental-
    * ingest discipline applied to the recommender. No minSupport here:
    * pruning is a QUERY-time decision ([[itemItemRecsFromCounts]]),
    * never baked into a mergeable artifact (a pruned artifact cannot
    * be merged — support below threshold in both halves can cross it
    * in the union). */
  def coCounts(df: DataFrame, userCol: String, itemCol: String,
      maxUserItems: Int = 1000): DataFrame = {
    val ui = df.select(col(userCol).as("_u"), col(itemCol).as("_i"))
      .where(col("_u").isNotNull && col("_i").isNotNull)
      .distinct()
    val sizes = ui.groupBy("_u").agg(count(lit(1)).as("_sz"))
    val kept = ui.join(sizes.where(col("_sz") <= maxUserItems)
      .select("_u"), Seq("_u"), "left_semi")
    val itemCnt = kept.groupBy(col("_i"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("_i").as("a"), lit(null).cast(ui.schema("_i").dataType)
        .as("b"), col("cnt"))
    val pairs = kept.select(col("_u"), col("_i").as("a"))
      .join(kept.select(col("_u"), col("_i").as("b")), Seq("_u"))
      .where(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
    itemCnt.unionByName(pairs)
  }

  /** Sum-merge two [[coCounts]] artifacts (user-disjoint batches —
    * see the contract there). Lossless and associative: merge of any
    * split equals the one-shot build, exactly. */
  def coCountsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("a", "b").agg(sum("cnt").as("cnt"))

  /** [[itemItemRecs]] served OFF the persisted [[coCounts]] artifact —
    * same math, same output columns, but the expensive co-count build
    * is read, not recomputed; minSupport/simTopK prune at query time.
    * `interactions` supplies the users to recommend for (their owned
    * items and the anti-join), and must be consistent with the
    * artifact's kept universe for exact [[itemItemRecs]] parity. */
  def itemItemRecsFromCounts(counts: DataFrame, interactions: DataFrame,
      userCol: String, itemCol: String, topN: Int = 10,
      minSupport: Long = 2L, maxUserItems: Int = 1000,
      simTopK: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ui = interactions.select(col(userCol).as("_u"),
        col(itemCol).as("_i"))
      .where(col("_u").isNotNull && col("_i").isNotNull)
      .distinct()
    val sizes = ui.groupBy("_u").agg(count(lit(1)).as("_sz"))
    val kept = ui.join(sizes.where(col("_sz") <= maxUserItems)
      .select("_u"), Seq("_u"), "left_semi")
    val itemCnt = counts.where(col("b").isNull)
      .select(col("a").as("_i"), col("cnt").as("_cnt"))
    val co = counts.where(col("b").isNotNull &&
      col("cnt") >= minSupport)
    val sims = co
      .join(itemCnt.select(col("_i").as("a"), col("_cnt").as("_ca")),
        Seq("a"))
      .join(itemCnt.select(col("_i").as("b"), col("_cnt").as("_cb")),
        Seq("b"))
      .select(col("a"), col("b"),
        round(col("cnt").cast("double") * 1e6 /
          sqrt(col("_ca").cast("double") * col("_cb").cast("double")))
          .cast("long").as("_sim_ppm"))
      .withColumn("_nrk", row_number().over(Window.partitionBy("a")
        .orderBy(col("_sim_ppm").desc, col("b").asc)))
      .where(col("_nrk") <= simTopK)
      .drop("_nrk")
    val scored = kept.select(col("_u"), col("_i").as("a"))
      .join(sims, Seq("a"))
      .groupBy(col("_u"), col("b"))
      .agg(sum("_sim_ppm").as("score_ppm"),
        count(lit(1)).as("n_contrib"))
      .join(kept.select(col("_u"), col("_i").as("b")),
        Seq("_u", "b"), "left_anti")
    val w = Window.partitionBy("_u")
      .orderBy(col("score_ppm").desc, col("b").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= topN)
      .select(col("_u").as("user"), col("b").as("item"),
        col("score_ppm"), col("n_contrib"), col("rn"))
  }

  /** Coverage / popularity-bias report of a recommendation table —
    * the two numbers a recommender review asks first: what share of
    * the catalog ever gets recommended (low = popularity trap), and
    * how concentrated the recommendation mass is across items (the
    * [[GroupOps.concentration]] Gini/HHI machinery applied to per-item
    * rec counts — exact integer core, one division each). Catalog =
    * caller-supplied item universe (distinct-ed here), so dead items
    * count against coverage. Returns one row: (n_rows, n_users,
    * n_catalog, n_recommended, coverage_ppm, total, gini_num, gini,
    * hhi). */
  def coverageReport(recs: DataFrame, catalog: DataFrame,
      userCol: String = "user", itemCol: String = "item"): DataFrame = {
    val r = recs.select(col(userCol).as("_u"), col(itemCol).as("_i"))
      .where(col("_u").isNotNull && col("_i").isNotNull)
    val nCat = catalog.select(col(itemCol).as("_i"))
      .where(col("_i").isNotNull).distinct()
      .agg(count(lit(1)).as("n_catalog"))
    val base = r.agg(count(lit(1)).as("n_rows"),
      countDistinct("_u").as("n_users"))
    val conc = GroupOps.concentration(r, col("_i"), lit(1L))
      .withColumnRenamed("n_groups", "n_recommended")
    base.crossJoin(broadcast(nCat)).crossJoin(broadcast(conc))
      .withColumn("coverage_ppm", when(col("n_catalog") > 0L,
        expr("(n_recommended * 1000000L) div n_catalog")))
      .select("n_rows", "n_users", "n_catalog", "n_recommended",
        "coverage_ppm", "total", "gini_num", "gini", "hhi")
  }

  /** Next-item recommendations from a first-order transition model —
    * the SEQUENCE-aware sibling of [[itemItemRecs]] (co-occurrence
    * ignores order; "what do users touch AFTER this item" is a
    * different, often stronger signal for session continuation).
    * Transitions are CONSECUTIVE interaction pairs per user under the
    * caller's total order ((order, item) — deterministic under ties),
    * self-transitions drop, counts below `minCount` prune the noise
    * tail; each user's recommendation list is the top-N most frequent
    * successors of their LAST item, (−count, item)-ordered. All exact
    * integers; two user-partitioned windows + one transition groupBy.
    * Returns (user, item, cnt, rn) — rn 1..topN; users whose last item
    * has no surviving successors get no rows. */
  def nextItemRecs(df: DataFrame, userCol: String, itemCol: String,
      order: Column, topN: Int = 10, minCount: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val base = df.select(col(userCol).as("_u"), col(itemCol).as("_i"),
        order.as("_o"))
      .where(col("_u").isNotNull && col("_i").isNotNull &&
        col("_o").isNotNull)
    val w = Window.partitionBy("_u").orderBy(col("_o").asc, col("_i").asc)
    val withPrev = base.withColumn("_p", lag(col("_i"), 1).over(w))
      .withColumn("_rn", row_number().over(w))
    val trans = withPrev
      .where(col("_p").isNotNull && col("_p") =!= col("_i"))
      .groupBy(col("_p").as("a"), col("_i").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
    val wLast = Window.partitionBy("_u")
      .orderBy(col("_o").desc, col("_i").desc)
    val last = base.withColumn("_ln", row_number().over(wLast))
      .where(col("_ln") === 1).select(col("_u"), col("_i").as("a"))
    val wTop = Window.partitionBy("_u")
      .orderBy(col("cnt").desc, col("b").asc)
    last.join(trans, Seq("a"))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= topN)
      .select(col("_u").as("user"), col("b").as("item"), col("cnt"),
        col("rn"))
  }

  /** Leave-last-out hit-rate@N — the offline evaluation loop for
    * [[itemItemRecs]]: hold out each user's LAST interaction (by the
    * caller's total order, ties broken by item so the holdout is
    * deterministic), drop that (user, item) pair from the training
    * interactions ENTIRELY (the documented convention — a re-touched
    * holdout item would otherwise be owned and unrecommendable),
    * retrain the co-occurrence model on the remainder, and score a hit
    * when the held-out item lands in the user's top-N. Users whose
    * every interaction was with the holdout item leave no training
    * signal and drop from the denominator (reported). One extra
    * user-partitioned window + two joins on top of the recommender's
    * own plan. Returns one row:
    * (n_users, n_eval, n_hits, hit_rate). */
  def hitRateAtN(df: DataFrame, userCol: String, itemCol: String,
      order: Column, topN: Int = 10, minSupport: Long = 2L,
      maxUserItems: Int = 1000, simTopK: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(userCol).as("_u"), col(itemCol).as("_i"),
        order.as("_o"))
      .where(col("_u").isNotNull && col("_i").isNotNull &&
        col("_o").isNotNull)
    val w = Window.partitionBy("_u")
      .orderBy(col("_o").desc, col("_i").desc)
    val hold = base.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).select(col("_u"), col("_i").as("_h"))
    val train = base.join(hold, Seq("_u"))
      .where(col("_i") =!= col("_h"))
      .select(col("_u"), col("_i"))
    val nUsers = hold.agg(count(lit(1)).as("n_users"))
    val evalUsers = train.select("_u").distinct()
    val nEval = evalUsers.agg(count(lit(1)).as("n_eval"))
    val recs = itemItemRecs(train, "_u", "_i", topN, minSupport,
      maxUserItems, simTopK)
    val hits = recs
      .join(hold.select(col("_u").as("user"), col("_h")),
        Seq("user"))
      .where(col("item") === col("_h"))
      .agg(count(lit(1)).as("n_hits"))
    nUsers.crossJoin(broadcast(nEval)).crossJoin(broadcast(hits))
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("hit_rate", when(col("n_eval") > 0L,
        col("n_hits").cast("double") / col("n_eval").cast("double")))
  }

  /** Damped bias baseline — the "Netflix baseline" predictor
    * r̂ = μ + b_i + b_u that any factor model must beat before its
    * factors mean anything ([[als1]]'s null model). Estimated in the
    * standard two sequential closed-form passes with L2 damping:
    * b_i = Σ_{u∈R(i)}(r−μ)/(λ+|R(i)|), then
    * b_u = Σ_{i∈R(u)}(r−μ−b_i)/(λ+|R(u)|) — damping λ shrinks
    * thin-history biases toward 0. FULLY integer-exact: μ, every b_i
    * and b_u are ppm longs by truncating integer division of exact
    * residual sums (toward zero — Spark `div` and DuckDB `//` share
    * that convention, verified on negatives; μ first, so item
    * residuals are longs; b_i next, so user residuals are longs —
    * each stage quantized once by construction, no float anywhere). |r| ≤ 10⁶ in-plan guard. Scale shape: three
    * aggregations and one broadcast + one item-keyed join — ratings
    * never collected. Returns (userBias(user, n_u, b_u_ppm),
    * itemBias(item, n_i, b_i_ppm, mu_ppm)). */
  def biasBaseline(df: DataFrame, userCol: String, itemCol: String,
      rating: Column, lambda: Long = 10L): (DataFrame, DataFrame) = {
    require(lambda >= 0L, s"lambda must be >= 0, got $lambda")
    val r = df.select(col(userCol).as("_u"), col(itemCol).as("_i"),
        rating.cast("long").as("_r"))
      .where(col("_u").isNotNull && col("_i").isNotNull &&
        col("_r").isNotNull)
      .withColumn("_r", when(abs(col("_r")) <= 1000000L, col("_r"))
        .otherwise(raise_error(concat(
          lit("biasBaseline: |rating| > 1e6 — scale it down: "),
          col("_r").cast("string")))))
    // integer division TRUNCATES toward zero on both engines (Spark
    // `div` and DuckDB `//` agree, verified on -7/2 -> -3) — residual
    // sums go negative, so the convention matters and is documented
    val mu = r.agg(count(lit(1)).as("_n"), sum("_r").as("_s"))
      .select(expr("(_s * 1000000L) div _n").as("mu_ppm"))
    val withMu = r.crossJoin(broadcast(mu))
    val items = withMu
      .groupBy(col("_i"))
      .agg(count(lit(1)).as("n_i"),
        sum(col("_r") * 1000000L - col("mu_ppm")).as("_sr"),
        first("mu_ppm").as("mu_ppm"))
      .withColumn("b_i_ppm", expr(s"_sr div (${lambda}L + n_i)"))
      .select(col("_i"), col("n_i"), col("b_i_ppm"), col("mu_ppm"))
    val users = withMu
      .join(items.select(col("_i"), col("b_i_ppm")), Seq("_i"))
      .groupBy(col("_u"))
      .agg(count(lit(1)).as("n_u"),
        sum(col("_r") * 1000000L - col("mu_ppm") - col("b_i_ppm"))
          .as("_sr"))
      .withColumn("b_u_ppm", expr(s"_sr div (${lambda}L + n_u)"))
      .select(col("_u").as("user"), col("n_u"), col("b_u_ppm"))
    (users, items.withColumnRenamed("_i", "item"))
  }

  /** Rank-1 alternating least squares on an explicit integer rating
    * table — the matrix-factorization kernel in its smallest
    * deterministic form (one latent factor per user and item; the
    * rank-k path is [[Pca]]'s Jacobi territory). Each half-step has
    * the CLOSED FORM u_i = Σ_j r_ij·v_j / Σ_j v_j², so one iteration
    * is two groupBy aggregations — no gradient, no learning rate.
    * Engine-replayable by the quantize-once-per-update rule: factors
    * live as ppm longs (v⁰ = 10⁶ for every item), the update's
    * numerator Σ r·v_ppm and denominator Σ v_ppm² accumulate EXACTLY
    * in Decimal(38,0), and the new factor is ONE float chain
    * round(10¹²·num/den) (10¹² because num carries one ppm scale and
    * den carries two) — both engines fold identical integers and
    * round once. |r| ≤ 10⁶ and |factor| ≤ 10¹² are in-plan
    * raise_error guards (larger means unscaled input / divergence —
    * caller bugs, not data). Items or users with an all-zero
    * denominator (possible once factors hit exact 0) get factor 0.
    *
    * Scale shape: 2·`iters` shuffles of (key, num, den) partial
    * aggregates — the rating table is never collected, factors are
    * one row per user/item. Returns (userFactors(user, u_ppm),
    * itemFactors(item, v_ppm)). */
  def als1(df: DataFrame, userCol: String, itemCol: String,
      rating: Column, iters: Int = 2): (DataFrame, DataFrame) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val r = df.select(col(userCol).as("_u"), col(itemCol).as("_i"),
        rating.cast("long").as("_r"))
      .where(col("_u").isNotNull && col("_i").isNotNull &&
        col("_r").isNotNull)
      .withColumn("_r", when(abs(col("_r")) <= 1000000L, col("_r"))
        .otherwise(raise_error(concat(
          lit("als1: |rating| > 1e6 — scale it down: "),
          col("_r").cast("string")))))
    def guarded(c: Column, what: String): Column =
      when(abs(c) <= 1000000000000L, c)
        .otherwise(raise_error(concat(
          lit(s"als1: $what factor diverged past 1e12 ppm: "),
          c.cast("string"))))
    // one half-step: solve the `out` side given the fixed factor table
    // (keyName, factorName); the select-alias mints fresh attribute ids
    // so the repeated r-lineage self-joins never go ambiguous
    def half(fixed: DataFrame, keyName: String, factorName: String,
        out: String): DataFrame = {
      val fx = fixed.select(col(keyName).as("_k"),
        col(factorName).as("_f"))
      r.join(fx, col(keyName) === col("_k"))
        .groupBy(col(out))
        .agg(
          sum((col("_r") * col("_f")).cast("decimal(38,0)")).as("_num"),
          sum((col("_f") * col("_f")).cast("decimal(38,0)")).as("_den"))
        .select(col(out),
          guarded(when(col("_den") === lit(0L).cast("decimal(38,0)"),
            lit(0L))
            .otherwise(round(col("_num").cast("double") * 1e12 /
              col("_den").cast("double")).cast("long")),
            out.stripPrefix("_")).as("f_ppm"))
    }
    var items = r.select(col("_i")).distinct()
      .withColumn("v_ppm", lit(1000000L))
    var users: DataFrame = null
    for (_ <- 1 to iters) {
      users = half(items, "_i", "v_ppm", "_u")
        .withColumnRenamed("f_ppm", "u_ppm")
      items = half(users, "_u", "u_ppm", "_i")
        .withColumnRenamed("f_ppm", "v_ppm")
    }
    (users.withColumnRenamed("_u", "user"),
      items.withColumnRenamed("_i", "item"))
  }
}
