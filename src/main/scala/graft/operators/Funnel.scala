package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over event streams — the product-analytics
  * sibling of the sessionization ops (q16/q125/q138): how far along a
  * required event sequence each user gets, every step strictly AFTER
  * the previous one and (optionally) within `windowNs` of the first
  * step.
  *
  * Semantics (strict-order, earliest-completion funnel):
  *
  *   t₁(u)     = min ts of step-1 events
  *   tᵢ₊₁(u)   = min ts of step-(i+1) events with ts > tᵢ(u)
  *               and ts − t₁(u) <= windowNs
  *
  * The window anchors at the user's FIRST step-1 event (the standard
  * analytics convention — a later anchor could occasionally convert
  * deeper, but re-anchoring is a different metric). Conditional on
  * that anchor, taking the earliest feasible timestamp at each later
  * step only widens downstream feasible sets, so the greedy chain is
  * optimal and the result is a pure function of the event set
  * (layout-invariant, engine-replayable).
  *
  * Scale shape: per step ONE user-keyed equi-join of that step's
  * filtered events against the O(users) step-time table + one
  * partial-agg min — |steps| is a small constant, there are no windows
  * and no per-user event sorts. All timestamps are integer
  * nanoseconds. */
object Funnel {

  /** Per-user step times + reached depth. Users with no step-1 event
    * are absent (depth-0 rows carry no information the caller can't
    * reconstruct). Returns (userCol, step_1..step_k ns longs — null
    * where unreached — and depth). */
  def funnelUsers(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      windowNs: Long = Long.MaxValue): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"repeated step types are ambiguous: $steps")
    val ev = events.select(col(userCol).as("_u"), col(typeCol).as("_t"),
      col(tsCol).cast("long").as("_ts"))
    var acc = ev.where(col("_t") === steps.head)
      .groupBy("_u").agg(min("_ts").as("step_1"))
    for (i <- 2 to steps.length) {
      val nxt = ev.where(col("_t") === steps(i - 1))
        .join(acc.select(col("_u"), col(s"step_${i - 1}").as("_tp"),
          col("step_1").as("_t1")), Seq("_u"))
        .where(col("_ts") > col("_tp") &&
          col("_ts") - col("_t1") <= windowNs)
        .groupBy("_u").agg(min("_ts").as(s"step_$i"))
      acc = acc.join(nxt, Seq("_u"), "left")
    }
    val depth = (1 to steps.length)
      .map(i => when(col(s"step_$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("depth", depth).withColumnRenamed("_u", userCol)
  }

  /** Step-level conversion table: (step, step_name, users) where
    * `users` counts users reaching at least that step. One O(users)
    * aggregation over [[funnelUsers]]. */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      windowNs: Long = Long.MaxValue): DataFrame = {
    val fu = funnelUsers(events, userCol, typeCol, tsCol, steps, windowNs)
    val sums = (1 to steps.length).map(i =>
      sum(when(col(s"step_$i").isNotNull, 1L).otherwise(0L)).as(s"_n$i"))
    fu.agg(sums.head, sums.tail: _*)
      .select(posexplode(array((1 to steps.length).map(i =>
        col(s"_n$i")): _*)).as(Seq("_p", "users")))
      .select((col("_p") + 1).cast("int").as("step"),
        typedLit(steps).getItem(col("_p")).as("step_name"),
        col("users"))
  }

  /** Retention cohort matrix: users are cohorted by the period of
    * their FIRST event (period = ts div periodNs — timestamps must be
    * non-negative for div to be floor), then counted once per
    * (cohort, period-offset) they were active in. Two aggregations and
    * one user-keyed join — the weekly/daily retention triangle at any
    * scale. Returns (cohort, offset, users): `cohort` the period index
    * of first activity, `offset` periods since it (0 = the cohort's
    * own period, so offset-0 users = cohort size). */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
      periodNs: Long): DataFrame = {
    require(periodNs > 0, s"periodNs must be positive, got $periodNs")
    val ev = events.select(col(userCol).as("_u"),
      col(tsCol).cast("long").as("_ts"))
    val first = ev.groupBy("_u").agg(min("_ts").as("_f"))
      .select(col("_u"), expr(s"_f div ${periodNs}L").as("_cp"))
    val active = ev.select(col("_u"),
        expr(s"_ts div ${periodNs}L").as("_p"))
      .distinct()
    active.join(first, Seq("_u"))
      .groupBy(col("_cp").as("cohort"),
        (col("_p") - col("_cp")).cast("int").as("offset"))
      .agg(count(lit(1)).as("users"))
  }

  /** [[retentionCohorts]] weighted by value — the cohort REVENUE
    * matrix (LTV curves): per (cohort, offset) cell the active-user
    * count, the event count, and the exact value sum in integer cents
    * (quantize the value column upstream — `round(value*100)` — so
    * sums are order-free exact longs). Same two-aggregation + one
    * user-keyed join shape. Returns (cohort, offset, users, events,
    * value_cents). */
  def cohortValues(events: DataFrame, userCol: String, tsCol: String,
      periodNs: Long, valueCents: Column): DataFrame = {
    require(periodNs > 0, s"periodNs must be positive, got $periodNs")
    val ev = events.select(col(userCol).as("_u"),
      col(tsCol).cast("long").as("_ts"),
      coalesce(valueCents.cast("long"), lit(0L)).as("_v"))
    val first = ev.groupBy("_u").agg(min("_ts").as("_f"))
      .select(col("_u"), expr(s"_f div ${periodNs}L").as("_cp"))
    val per = ev.select(col("_u"),
        expr(s"_ts div ${periodNs}L").as("_p"), col("_v"))
      .groupBy("_u", "_p")
      .agg(count(lit(1)).as("_n"), sum("_v").as("_vs"))
    per.join(first, Seq("_u"))
      .groupBy(col("_cp").as("cohort"),
        (col("_p") - col("_cp")).cast("int").as("offset"))
      .agg(count(lit(1)).as("users"), sum("_n").as("events"),
        sum("_vs").as("value_cents"))
  }

  /** Shared conversions⋈touches trailing-window join for the
    * attribution family ([[linearAttribution]] /
    * [[positionAttribution]] / [[timeDecayAttribution]] /
    * [[shapleyAttribution]]), with the HOT-USER VALVE: the user-keyed
    * join materializes conversions×touches rows per user BEFORE the
    * window predicate can cut them, so one bot user with 10⁶ touches
    * and 10³ conversions would put 10⁹ intermediate rows on a single
    * key. Users whose TOUCH count exceeds `maxUserTouches` DROP
    * ENTIRELY — touches and conversions both, the
    * [[Recommend.itemItemRecs]] `maxUserItems` convention (the kept
    * universe stays consistent across every model, and a bot's credit
    * is noise, not signal). Zero-touch users never
    * reached the output anyway (the join is inner), so the valve
    * changes results ONLY for users over the cap; per kept user the
    * join is bounded at conversions×maxUserTouches rows. The valve is
    * OPT-IN (default `Int.MaxValue` = off) so upgrades never silently
    * shrink rollups; pass a finite cap on bot-prone corpora. The
    * per-user count rides a window over the touch side itself (the
    * minhashAgainstSigs pattern) so the live `events` plan is
    * evaluated once per side, never re-evaluated for a separate
    * count aggregation, and the window's `_u` hash partitioning is
    * the join's own exchange. Over-cap users drop ENTIRELY — touches
    * AND conversions (the [[Recommend.itemItemRecs]] `maxUserItems`
    * convention): their touches are filtered out, so their
    * conversions lose every inner-join partner. Returns
    * (_u, _cid, _cts, _tts, channel). */
  private def attributionJoined(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, idCol: String,
      conversionType: String, touchTypes: Seq[String], windowNs: Long,
      maxUserTouches: Int): DataFrame = {
    require(windowNs > 0, s"windowNs must be positive, got $windowNs")
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(conversionType),
      "conversionType cannot also be a touch type")
    require(maxUserTouches >= 1,
      s"maxUserTouches must be >= 1, got $maxUserTouches")
    val ev = events.select(col(userCol).as("_u"),
      col(tsCol).cast("long").as("_ts"), col(typeCol).as("_t"),
      col(idCol).as("_id"))
    val touchAll = ev.where(col("_t").isin(touchTypes.map(_.asInstanceOf[Any]): _*))
      .select(col("_u"), col("_ts").as("_tts"), col("_t").as("channel"))
    // Finite cap rides an AGGREGATE, not a window (r9 ADVICE): the bot
    // user with millions of touches — exactly who the valve exists to
    // drop — is also exactly the partition a per-user window would
    // buffer/spill in WindowExec, while the groupBy collapses them
    // map-side to one row each. The second touchAll reference is
    // column-pruned to `_u` alone. NO forced broadcast on the over-cap
    // set: it is tiny only when the cap is anomaly-sized — a small cap
    // on a heavy-touch corpus makes it most of the user base, and a
    // forced broadcast would OOM exactly there; AQE picks broadcast
    // when the set is actually small (r10 review finding).
    val touch =
      if (maxUserTouches == Int.MaxValue) touchAll
      else {
        val overCap = touchAll.groupBy("_u")
          .agg(count(lit(1)).as("_tc"))
          .where(col("_tc") > maxUserTouches)
          .select("_u")
        touchAll.join(overCap, Seq("_u"), "left_anti")
      }
    val conv = ev.where(col("_t") === conversionType)
      .select(col("_u"), col("_ts").as("_cts"), col("_id").as("_cid"))
    conv.join(touch, Seq("_u"))
      .where(col("_tts") < col("_cts") &&
        col("_tts") >= col("_cts") - windowNs)
  }

  /** Linear multi-touch attribution: each conversion's credit splits
    * EQUALLY across the user's touch events in the trailing window —
    * the standard marketing/channel-credit model beside last-touch
    * (which is the as-of join). Credit per touch = 10⁶ div n ppm of
    * its conversion (floor — a conversion's credit sums to ≤ 10⁶ by
    * exactly the floor remainder, deterministic); conversions with no
    * in-window touch carry no credit (reported via n_conversions
    * vs converted_attributed).
    *
    * Scale shape: one user-keyed conversions⋈touches join bounded by
    * per-user activity and the [[attributionJoined]] hot-user valve
    * (`maxUserTouches` — over-cap users drop entirely), a
    * per-conversion count, one channel rollup — no windows. All
    * integers exact. Returns one row per channel:
    * (channel, touches, conversions_touched, credit_ppm). */
  def linearAttribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, conversionType: String,
      touchTypes: Seq[String], windowNs: Long,
      maxUserTouches: Int = Int.MaxValue): DataFrame = {
    val joined = attributionJoined(events, userCol, tsCol, typeCol,
      idCol, conversionType, touchTypes, windowNs, maxUserTouches)
    val n = joined.groupBy("_cid").agg(count(lit(1)).as("_n"))
    joined.join(n, Seq("_cid"))
      .groupBy("channel")
      .agg(count(lit(1)).as("touches"),
        countDistinct("_cid").as("conversions_touched"),
        sum(expr("1000000L div _n")).as("credit_ppm"))
  }

  /** U-shaped (position-based) multi-touch attribution — the standard
    * sibling of [[linearAttribution]]: the FIRST touch earns 40%, the
    * LAST 40%, the middles split the remaining 20% equally (floor div
    * ppm); one touch takes 100%, two touches split 50/50 (the
    * degenerate-U convention). Position = row_number over (ts,
    * channel) inside the conversion — touches identical in (ts,
    * channel) are interchangeable, so per-channel credit sums are
    * deterministic under any tie assignment.
    *
    * Scale shape: [[attributionJoined]]'s user-keyed window join
    * (hot-user valve included), then two windows PARTITIONED PER
    * CONVERSION (bounded by that user's in-window touches, never
    * global) + one channel rollup. All credits exact ppm integers.
    * Returns (channel, touches, conversions_touched, credit_ppm). */
  def positionAttribution(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, idCol: String,
      conversionType: String, touchTypes: Seq[String],
      windowNs: Long, maxUserTouches: Int = Int.MaxValue): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_cid")
    val joined = attributionJoined(events, userCol, tsCol, typeCol,
      idCol, conversionType, touchTypes, windowNs, maxUserTouches)
      .withColumn("_rnk", row_number().over(
        w.orderBy(col("_tts").asc, col("channel").asc)))
      .withColumn("_n", count(lit(1)).over(w))
    val credit =
      when(col("_n") === 1L, lit(1000000L))
        .when(col("_n") === 2L, lit(500000L))
        .when(col("_rnk") === 1L || col("_rnk") === col("_n"),
          lit(400000L))
        .otherwise(expr("200000L div (_n - 2)"))
    joined.groupBy("channel")
      .agg(count(lit(1)).as("touches"),
        countDistinct("_cid").as("conversions_touched"),
        sum(credit).as("credit_ppm"))
  }

  /** Time-decay multi-touch attribution — the third standard model
    * beside [[linearAttribution]] and [[positionAttribution]]: recent
    * touches earn more, with weight halving per half-life of distance
    * from the conversion. The decay is the DISCRETE step convention —
    * w_ppm = 10⁶ div 2^(Δt div halfLifeNs), capped at 62 halvings —
    * so every weight is a pure integer (no pow/exp chain to mirror at
    * the ulp) and a conversion's credits are exact floor-div shares
    * credit_ppm = (w·10⁶) div Σw of exact integer sums. Conversions
    * whose every in-window touch decayed to weight 0 attribute nothing
    * (reported via conversions_touched vs the caller's conversion
    * count, the [[linearAttribution]] rule).
    *
    * Scale shape: the same user-keyed window join
    * ([[attributionJoined]], hot-user valve included) + one
    * per-conversion weight-sum aggregation + one channel rollup — no
    * windows at all.
    * Returns (channel, touches, conversions_touched, credit_ppm). */
  def timeDecayAttribution(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, idCol: String,
      conversionType: String, touchTypes: Seq[String], windowNs: Long,
      halfLifeNs: Long, maxUserTouches: Int = Int.MaxValue): DataFrame = {
    require(halfLifeNs > 0, s"halfLifeNs must be positive, got $halfLifeNs")
    val joined = attributionJoined(events, userCol, tsCol, typeCol,
      idCol, conversionType, touchTypes, windowNs, maxUserTouches)
      .withColumn("_w", expr(
        s"1000000L div shiftleft(1L, cast(least((_cts - _tts) div ${halfLifeNs}L, 62L) as int))"))
    val tot = joined.groupBy("_cid").agg(sum("_w").as("_ws"))
    joined.join(tot, Seq("_cid"))
      .where(col("_ws") > 0L)
      .groupBy("channel")
      .agg(count(lit(1)).as("touches"),
        countDistinct("_cid").as("conversions_touched"),
        sum(expr("(_w * 1000000L) div _ws")).as("credit_ppm"))
  }

  /** Shapley-value channel attribution — the game-theoretic model that
    * closes the heuristic family ([[linearAttribution]] /
    * [[positionAttribution]] / [[timeDecayAttribution]] are fixed
    * credit RULES; Shapley derives credit from what coalitions of
    * channels actually convert). Characteristic function:
    * v(S) = #conversions whose in-window touched-channel set T ⊆ S
    * ("reachable with only S's channels" — the standard coalition
    * reading of set-level conversion counts), so
    * φ_c = Σ_{S ∌ c} |S|!(k−1−|S|)!/k!·(v(S∪{c}) − v(S)) and
    * Σφ_c = v(all) = total attributed conversions, exactly.
    *
    * Exactness + scale: the data-sized work is
    * [[attributionJoined]]'s valved user-keyed window join, ONE
    * distinct + set-assembly aggregation per conversion and ONE count
    * per observed channel set (≤ 2^k rows); the 2^k·k Shapley sweep runs
    * DRIVER-SIDE over that bounded artifact in exact BigInt rationals
    * (the Pca Jacobi / kmeans-centroid guarded-fit pattern), refused
    * loudly past `maxChannels` (2^20 coalitions is a modeling error,
    * not data). Credit is quantized ONCE at output:
    * phi_ppm = ⌊10⁶·φ_num/(k!·v_all)⌋ (share of attributed
    * conversions) plus the exact integer numerator at k!-scale.
    * Channels touching no conversion earn 0. Returns one row per
    * channel: (channel, n_sets, phi_kfact (φ·k! exact), phi_ppm). */
  def shapleyAttribution(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, idCol: String,
      conversionType: String, touchTypes: Seq[String], windowNs: Long,
      maxChannels: Int = 16, maxUserTouches: Int = Int.MaxValue): DataFrame = {
    require(touchTypes.size <= maxChannels && maxChannels <= 20,
      s"shapleyAttribution: ${touchTypes.size} channels exceeds " +
        s"maxChannels=$maxChannels (2^k coalitions — cap is 20)")
    val spark = events.sparkSession
    import spark.implicits._
    val channels = touchTypes.sorted
    val idx = channels.zipWithIndex.toMap
    val bit = channels.foldLeft(lit(0L)) { (acc, c) =>
      acc.bitwiseOR(when(col("channel") === c,
        lit(1L << idx(c))).otherwise(0L))
    }
    // per conversion: the OR of its touched-channel bits (exactly-once
    // via distinct channel per conversion), then one count per set
    val sets = attributionJoined(events, userCol, tsCol, typeCol,
        idCol, conversionType, touchTypes, windowNs, maxUserTouches)
      .select(col("_cid"), bit.as("_b")).distinct()
      .groupBy("_cid").agg(sum("_b").as("_set"))
      .groupBy("_set").agg(count(lit(1)).as("_n"))
    val obs = sets.as[(Long, Long)].collect().toMap // <= 2^k rows
    val k = channels.size
    val full = 1 << k
    // v(S) = sum of conv counts over observed subsets of S
    val v = Array.tabulate(full) { s =>
      obs.iterator.collect {
        case (t, n) if (t & s) == t => n
      }.sum
    }
    val fact = Array.tabulate(k + 1)(i =>
      (1 to i).foldLeft(BigInt(1))(_ * _))
    val kFact = fact(k)
    val vAll = v(full - 1)
    val rows = channels.map { c =>
      val ci = 1 << idx(c)
      var num = BigInt(0)
      var s = 0
      while (s < full) {
        if ((s & ci) == 0) {
          val size = java.lang.Integer.bitCount(s)
          num += fact(size) * fact(k - 1 - size) *
            BigInt(v(s | ci) - v(s))
        }
        s += 1
      }
      val ppm =
        if (vAll == 0L) 0L
        else (num * 1000000 / (kFact * vAll)).toLong
      require(num.isValidLong,
        s"shapleyAttribution: phi numerator for $c exceeds int64 " +
          s"at k!-scale — reduce channels or conversions: $num")
      (c, obs.count { case (t, _) => (t & ci) != 0L }.toLong,
        num.toLong, ppm)
    }
    spark.createDataFrame(rows)
      .toDF("channel", "n_sets", "phi_kfact", "phi_ppm")
  }

  /** Batch gap sessionization — the classic clickstream partitioner
    * (the batch twin of the streaming flatMapGroupsWithState sessions
    * in [[graft.streaming.EventStream]]): a new session starts at the
    * first event of a user and at every event whose gap from the
    * previous one EXCEEDS `gapNs` (a gap of exactly `gapNs` stays in
    * the session). Per session: 1-based index within the user, event
    * count, exact integer start/end/duration ns, and distinct event
    * types.
    *
    * Scale shape: two per-user windows (lag + running sum of the
    * new-session flag) partitioned by user — never a global window —
    * then one (user, session) hash aggregation; at 100 TB this
    * shuffles once on the user key and everything else is map-side.
    * Returns (user, session_idx, n_events, start_ns, end_ns,
    * duration_ns, n_types). */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, gapNs: Long): DataFrame =
    sessionAssigned(events, userCol, tsCol, typeCol, gapNs)
      .groupBy(col("_u").as("user"), col("_sid").as("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min("_ts").as("start_ns"), max("_ts").as("end_ns"),
        (max("_ts") - min("_ts")).as("duration_ns"),
        countDistinct("_t").as("n_types"))

  /** Shared session-id assignment: events as (_u, _ts, _t, _sid) with
    * the [[sessionize]] break rule. Null-ts rows drop (an undated
    * event would null its gap and silently glue onto the previous
    * session). */
  private def sessionAssigned(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, gapNs: Long): DataFrame = {
    require(gapNs > 0, s"gapNs must be positive, got $gapNs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_u").orderBy(col("_ts").asc, col("_t").asc)
    events.select(col(userCol).as("_u"), col(tsCol).cast("long").as("_ts"),
        col(typeCol).as("_t"))
      .where(col("_ts").isNotNull)
      .withColumn("_prev", lag("_ts", 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull || col("_ts") - col("_prev") > gapNs,
          lit(1L)).otherwise(lit(0L)))
      .withColumn("_sid", sum("_new").over(w))
      .drop("_prev", "_new")
  }

  /** Frequent contiguous session paths — the gap-free cut of
    * sequential-pattern mining (PrefixSpan with maxGap=0, which is
    * the product-analytics standard: "what are the top n-step flows").
    * Events sessionize by `gapNs`, order inside the session by
    * (ts, type) — equal-(ts, type) rows are identical in every field
    * used, so the n-gram multiset is order-invariant — and every
    * window of `n` consecutive event types becomes one path
    * occurrence. Per path: total occurrences and SUPPORT = distinct
    * sessions containing it (a session counts once however often the
    * path repeats inside it). Top `topK` by (support desc,
    * occurrences desc, path asc) — a total order, ties impossible
    * past the unique path key.
    *
    * Scale shape: the session windows partition by user, the n-gram
    * leads by (user, session) — never global; support is a two-phase
    * distinct-then-count aggregation on the path key; the top-k is
    * TakeOrderedAndProject, no global sort. All counts exact longs.
    * Returns (path, occurrences, support). */
  def frequentPaths(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, gapNs: Long, n: Int, topK: Int): DataFrame = {
    require(n >= 2, s"path length must be >= 2, got $n")
    require(topK > 0, s"topK must be positive, got $topK")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_u", "_sid").orderBy(col("_ts").asc, col("_t").asc)
    val grams = sessionAssigned(events, userCol, tsCol, typeCol, gapNs)
      .select(col("_u"), col("_sid"),
        concat_ws(">", (Seq(col("_t")) ++
          (1 until n).map(i => lead("_t", i).over(w))): _*).as("path"),
        lead("_t", n - 1).over(w).isNotNull.as("_full"))
      .where(col("_full"))
    grams.groupBy("path")
      .agg(count(lit(1)).as("occurrences"),
        countDistinct(col("_u"), col("_sid")).as("support"))
      .orderBy(col("support").desc, col("occurrences").desc,
        col("path").asc)
      .limit(topK)
  }
}
