package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Grouping / batching / corpus-statistics operators
  * (reference: docarray/array/mixins/group.py:17-95 split_by_tag + batch;
  * docarray/array/mixins/text.py:8-29 get_vocabulary;
  * docarray/array/mixins/sample.py:11-39 sample/shuffle). */
object GroupOps {

  /** Z-score standardization of scalar columns — the feature-scaling
    * pass before mixing heterogeneous signals (whitened PCA components,
    * quality-score ensembles). Engine-portable: values are quantized to
    * a 1/quant integer grid, the moment sums are EXACT (Decimal-summed,
    * overflow-safe at any corpus size), and each z-score is the single
    * float chain `(n·q − s) / sqrt(n·ss − s²)` — numerator an exact
    * long (`znum_<name>`, hash-gatable), denominator one sqrt.
    *
    * One tiny aggregate row broadcast back over the input: no second
    * shuffle, no window. Null values stay null (and are excluded from
    * that column's n/s/ss).
    *
    * Adds, per signal: `znum_<name>` (exact long) and `z_<name>_r`
    * (round-6 z-score; null when the signal is constant). */
  def standardize(df: DataFrame, values: Seq[(String, Column)],
      quant: Double = 10000.0): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(values.nonEmpty, "need at least one value column")
    val dec = DecimalType(38, 0)
    val qName = (n: String) => s"_q_$n"
    val base = df.select(df.columns.map(col) ++ values.map { case (n, c) =>
      round(c.cast("double") * quant).cast("long").as(qName(n))
    }: _*)
    val aggs = values.flatMap { case (n, _) => Seq(
      count(col(qName(n))).as(s"_n_$n"),
      sum(col(qName(n)).cast(dec)).as(s"_s_$n"),
      sum(col(qName(n)).cast(dec) * col(qName(n)).cast(dec)).as(s"_ss_$n"))
    }
    val stats = base.agg(aggs.head, aggs.tail: _*)
    val out = base.crossJoin(broadcast(stats))
    val zCols = values.flatMap { case (n, _) =>
      val (q, nn, s, ss) = (col(qName(n)), col(s"_n_$n").cast(dec),
        col(s"_s_$n"), col(s"_ss_$n"))
      val num = (nn * q.cast(dec) - s)
      val den = (nn * ss - s * s)
      Seq(num.cast("long").as(s"znum_$n"),
        when(den > 0, round(num.cast("double") / sqrt(den.cast("double")), 6))
          .as(s"z_${n}_r"))
    }
    out.select(df.columns.map(col) ++ zCols: _*)
  }

  /** Per-group tie-aware percentile ranks — the cross-source score
    * normalizer: heterogeneous quality signals (different scales per
    * source, heavy ties) become comparable [0, 1e6] percentiles before
    * a global keep-threshold or mixing draw.
    *
    * `d_rank` is the DOUBLED midrank 2·(#strictly-smaller) + #ties + 1
    * (the q132 exact-integer tie rule, per group) and
    * `pct_ppm = d_rank · 1e6 div (2n)` a single floor division — both
    * exact, layout-invariant, engine-replayable. Rows with a null value
    * keep null outputs.
    *
    * Scale shape: one (group, value) count aggregation (map-side
    * combined), a cumulative window over the DISTINCT values per group
    * (the q175 bounded-cardinality contract — for one giant ungrouped
    * series use `globalOrderIndex`), and one equi-join back onto the
    * rows. Appends (d_rank, pct_ppm). */
  def percentileRank(df: DataFrame, groupCols: Seq[String],
      value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(df.columns.map(col) :+ value.as("_v"): _*)
    val counts = base.where(col("_v").isNotNull)
      .groupBy(groupCols.map(col) :+ col("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val cum = Window.partitionBy(groupCols.map(col): _*).orderBy("_v")
    val ranked = counts
      .withColumn("_cum", sum("_c").over(cum))
      .withColumn("d_rank",
        lit(2L) * (col("_cum") - col("_c")) + col("_c") + 1L)
    val n = base.groupBy(groupCols.map(col): _*)
      .agg(count(col("_v")).as("_n"))
    base
      .join(ranked.select(groupCols.map(col) :+ col("_v") :+
        col("d_rank"): _*), groupCols :+ "_v", "left")
      .join(n, groupCols)
      .withColumn("pct_ppm",
        expr("(d_rank * 1000000) div (2 * _n)"))
      .select(df.columns.map(col) :+ col("d_rank") :+ col("pct_ppm"): _*)
  }

  /** Quantile normalization: replace each row's value with the POOLED
    * value at the row's within-group quantile — heterogeneous per-source
    * score distributions mapped onto one common scale (the cross-domain
    * complement of [[percentileRank]], which stops at the percentile).
    * Classic in batch-effect correction and multi-scorer calibration.
    *
    * Mechanics, all exact integers: within-group percentile = the
    * doubled-tie-midrank ppm of [[percentileRank]]; the pooled inverse
    * CDF is the value at rank ceil(pct·N/10⁶) (clamped to [1, N]) of
    * the pooled multiset, ranked by [[globalOrderIndex]]'s
    * range-partitioned total order — ties rank arbitrarily but the
    * VALUE at a given rank is unique, so the output is deterministic.
    * A group equal to the pool maps every value to itself (the midrank
    * lands inside its own tie run).
    *
    * Scale shape: percentileRank's distinct-value windows + ONE
    * range-partitioned rank of the pool + an equi-join on the computed
    * rank; N rides a broadcast 1-row agg, never a driver count. Null
    * values pass through with null outputs. Returns the input columns
    * plus (d_rank, pct_ppm, qn_value). */
  def quantileNormalize(df: DataFrame, groupCols: Seq[String],
      value: Column): DataFrame = {
    val pr = percentileRank(df, groupCols, value)
    val pool = df.select(value.as("_pv")).where(col("_pv").isNotNull)
    val ranked = globalOrderIndex(pool, "_r", col("_pv"))
      .select((col("_r") + 1L).as("_tr"), col("_pv").as("qn_value"))
    val n = pool.agg(count(lit(1)).as("_nt"))
    pr.crossJoin(broadcast(n))
      .withColumn("_tr",
        when(col("pct_ppm").isNotNull,
          greatest(lit(1L), least(col("_nt"),
            expr("(pct_ppm * _nt + 999999) div 1000000")))))
      .join(ranked, Seq("_tr"), "left")
      .drop("_tr", "_nt")
  }

  /** split_by_tag: one output group key per distinct value; returns the
    * groups as (tagValue, ids) rows — at scale prefer partitionBy writes
    * over materializing per-group arrays. */
  /** Element-wise mean/max pooling of a vector column per group — the
    * chunk→document embedding aggregation (passage embeddings pooled to
    * a doc embedding, doc embeddings pooled to a centroid per slice).
    * The mean is the exact integer mean of ppm-quantized components
    * (round-half-away, the [[Ann.kmeansLloyd]] centroid rule), the max
    * is taken on the quantized grid too — every output is an exact
    * long, so the pooled table is layout-invariant and replayable.
    *
    * Scale shape: posexplode → groupBy(group…, pos) whose map-side
    * partial agg collapses each partition to ≤ |groups|·dim rows before
    * the shuffle — never a collect_list of vectors. Returns one row per
    * (group…, pos): n, mean_ppm, max_ppm. Null vectors are dropped;
    * ragged dims pool per-position over the rows that have them. */
  def poolVectors(df: DataFrame, groupCols: Seq[String],
      vecCol: Column): DataFrame = {
    val vppm = transform(vecCol.cast("array<double>"),
      x => round(x * 1e6).cast("long"))
    val mag = expr("(abs(_sum) * 2 + _n) div (_n * 2)")
    df.select(groupCols.map(col) :+ vppm.as("_vppm"): _*)
      .where(col("_vppm").isNotNull)
      .select(groupCols.map(col) :+
        posexplode(col("_vppm")).as(Seq("_pos", "_x")): _*)
      .groupBy(groupCols.map(col) :+ col("_pos").as("pos"): _*)
      .agg(count(lit(1)).as("_n"), sum("_x").as("_sum"),
        max("_x").as("max_ppm"))
      .withColumn("mean_ppm",
        when(col("_sum") < 0, -mag).otherwise(mag))
      .select((groupCols.map(col) :+ col("pos") :+ col("_n").as("n") :+
        col("mean_ppm") :+ col("max_ppm")): _*)
  }

  /** Pairwise cosine similarity between per-group [[poolVectors]] mean
    * centroids — the domain-similarity matrix of mixture design (which
    * sources are near-duplicates of each other in embedding space,
    * which eval domain is closest to which training slice). Centroid
    * components are exact ppm longs, so `dot`/`na`/`nb` are exact
    * integer sums (order-free) and the cosine is ONE fixed float chain
    * over them — layout-invariant, engine-replayable.
    *
    * Scale: pooling is the map-side-collapsed posexplode agg; the pair
    * join is |G|² over |G| centroid rows — broadcast-sized for any
    * realistic group count. Returns (ga, gb, dot_ppm2, na_ppm2,
    * nb_ppm2, cos) for ga < gb with equal dims. */
  def centroidPairs(df: DataFrame, groupCol: String,
      vecCol: Column): DataFrame = {
    val cent = poolVectors(df, Seq(groupCol), vecCol)
      .groupBy(groupCol)
      .agg(sort_array(collect_list(
        struct(col("pos"), col("mean_ppm")))).as("_c"))
      .select(col(groupCol),
        transform(col("_c"), x => x.getField("mean_ppm")).as("_v"))
    val a = cent.select(col(groupCol).as("ga"), col("_v").as("_va"))
    val b = cent.select(col(groupCol).as("gb"), col("_v").as("_vb"))
    a.join(b, col("ga") < col("gb"))
      .where(size(col("_va")) === size(col("_vb")))
      .select(col("ga"), col("gb"),
        aggregate(zip_with(col("_va"), col("_vb"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("dot_ppm2"),
        aggregate(col("_va"), lit(0L),
          (acc, x) => acc + x * x).as("na_ppm2"),
        aggregate(col("_vb"), lit(0L),
          (acc, x) => acc + x * x).as("nb_ppm2"))
      .withColumn("cos",
        when(col("na_ppm2") > 0L && col("nb_ppm2") > 0L,
          col("dot_ppm2").cast("double") /
            (sqrt(col("na_ppm2").cast("double")) *
             sqrt(col("nb_ppm2").cast("double"))))
          .otherwise(lit(null).cast("double")))
  }

  /** Market-basket co-occurrence (support / confidence / lift) over
    * (basket, item) rows — "what co-occurs with what" across orders,
    * sessions, or docs-as-baskets-of-entities. Pair emission is one
    * basket-keyed self-join of the DISTINCT item sets with `a < b`
    * (each unordered pair once); `maxBasket` drops over-full baskets
    * from pairing before the quadratic blowup (conservative, the
    * gridPairs valve pattern). Counts are exact integers; confidence
    * and lift are single float chains over them:
    *
    *   conf(a→b) = sup(ab)/cnt(a),  lift = sup(ab)·N / (cnt(a)·cnt(b))
    *
    * Returns (a, b, support, cnt_a, cnt_b, n_baskets, conf_ab, lift)
    * for pairs with support >= minSupport. */
  def basketPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 1L, maxBasket: Int = 1000): DataFrame = {
    val bi = df.select(col(basketCol).as("_bk"), col(itemCol).as("_it"))
      .where(col("_bk").isNotNull && col("_it").isNotNull)
      .distinct()
    val sizes = bi.groupBy("_bk").agg(count(lit(1)).as("_sz"))
    val kept = bi.join(sizes.where(col("_sz") <= maxBasket)
      .select("_bk"), Seq("_bk"), "left_semi")
    // the universe is the KEPT baskets — counts, N, and pairs agree
    val nB = kept.agg(countDistinct(col("_bk")).as("n_baskets"))
    val itemCnt = kept.groupBy(col("_it")).agg(count(lit(1)).as("_cnt"))
    val pairs = kept.select(col("_bk"), col("_it").as("a"))
      .join(kept.select(col("_bk"), col("_it").as("b")), Seq("_bk"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
    pairs
      .join(itemCnt.select(col("_it").as("a"), col("_cnt").as("cnt_a")),
        Seq("a"))
      .join(itemCnt.select(col("_it").as("b"), col("_cnt").as("cnt_b")),
        Seq("b"))
      .crossJoin(broadcast(nB))
      .withColumn("conf_ab",
        col("support").cast("double") / col("cnt_a").cast("double"))
      .withColumn("lift",
        (col("support") * col("n_baskets")).cast("double") /
          (col("cnt_a") * col("cnt_b")).cast("double"))
      .select("a", "b", "support", "cnt_a", "cnt_b", "n_baskets",
        "conf_ab", "lift")
  }

  /** Concentration diagnostics of a weighted group distribution — is
    * the corpus dominated by a few sources? Exact integer machinery:
    * group sums ranked ascending via [[globalOrderIndex]] (n_groups
    * rows — trivial at any corpus size), then
    *
    *   Gini = (2·Σ rankᵢ·xᵢ − (n+1)·Σx) / (n·Σx)
    *   HHI  = Σ xᵢ² / (Σx)²          (both single divisions)
    *
    * with Σ rankᵢ·xᵢ and Σ xᵢ² accumulated in exact Decimal(38,0).
    * Returns one row (n_groups, total, gini_num, gini, hhi). */
  def concentration(df: DataFrame, groupCol: Column,
      weight: Column): DataFrame = {
    val sums = df.select(groupCol.as("_g"),
        coalesce(weight.cast("long"), lit(0L)).as("_w"))
      .where(col("_g").isNotNull)
      .groupBy("_g").agg(sum("_w").as("_x"))
    val ranked = globalOrderIndex(sums, "_gi", col("_x"), col("_g"))
    ranked.agg(count(lit(1)).as("n_groups"), sum("_x").as("total"),
        sum((col("_gi") + 1L).cast("decimal(38,0)") *
          col("_x").cast("decimal(38,0)")).as("_rx"),
        sum(col("_x").cast("decimal(38,0)") *
          col("_x").cast("decimal(38,0)")).as("_xx"))
      .withColumn("gini_num",
        (col("_rx") * 2 - (col("n_groups") + 1L).cast("decimal(38,0)") *
          col("total").cast("decimal(38,0)")).cast("long"))
      .withColumn("gini",
        when(col("total") > 0L && col("n_groups") > 0L,
          col("gini_num").cast("double") /
            (col("n_groups").cast("double") * col("total").cast("double")))
          .otherwise(lit(null).cast("double")))
      .withColumn("hhi",
        when(col("total") > 0L,
          col("_xx").cast("double") /
            (col("total").cast("double") * col("total").cast("double")))
          .otherwise(lit(null).cast("double")))
      .select("n_groups", "total", "gini_num", "gini", "hhi")
  }

  /** RFM segmentation — the classic customer-value grid: per entity,
    * recency (time units since last event, vs `asOf`), frequency
    * (event count), monetary (value sum), each scored 1..`nBins` by
    * EXACT rank bins — score = (rank·nBins) div n + 1 over the
    * worst→best order (oldest recency first, smallest frequency /
    * monetary first), ties broken on the entity key — so `nBins` is
    * always the best cohort and every bin boundary is integer
    * arithmetic, not a quantile estimate. Three
    * [[globalOrderIndex]] ranks (range-partitioned, never a
    * 1-partition sort) + three equi-joins back on the O(entities)
    * aggregate. Returns (cust, recency, frequency, monetary, r, f, m,
    * segment = "rfm" digits). */
  def rfmSegments(df: DataFrame, custCol: String, ts: Column,
      value: Column, asOf: Long, nBins: Int = 5): DataFrame = {
    require(nBins >= 1 && nBins <= 9,
      s"nBins must be in [1, 9] (segment is a digit string), got $nBins")
    val per = df.select(col(custCol).as("cust"), ts.cast("long").as("_ts"),
        value.cast("long").as("_v"))
      .where(col("_ts").isNotNull && col("_v").isNotNull)
      .groupBy("cust").agg(
        (lit(asOf) - max("_ts")).as("recency"),
        count(lit(1)).as("frequency"),
        sum("_v").as("monetary"))
    val n = per.agg(count(lit(1)).as("_n"))
    def scored(metricWorstFirst: Column, out: String): DataFrame =
      globalOrderIndex(per.select(col("cust"), metricWorstFirst.as("_m")),
          "_gi", col("_m"), col("cust"))
        .crossJoin(broadcast(n))
        .select(col("cust"),
          (expr(s"(_gi * $nBins) div _n") + 1L).cast("int").as(out))
    per
      .join(scored(-col("recency"), "r"), Seq("cust"))
      .join(scored(col("frequency"), "f"), Seq("cust"))
      .join(scored(col("monetary"), "m"), Seq("cust"))
      .withColumn("segment", concat(col("r").cast("string"),
        col("f").cast("string"), col("m").cast("string")))
  }

  /** Lorenz curve points — the distribution behind [[concentration]]'s
    * scalar Gini: rank groups by weight ascending, cut into `nPoints`
    * exact rank bins, and report each bin's cumulative share of the
    * total — "the bottom 80% of customers carry share_ppm of revenue".
    * One bounded agg + one [[globalOrderIndex]] rank + cum windows
    * over ≤ `nPoints` rows; shares exact floor-div ppm. Returns
    * (point, n_groups, x_sum, cum_n, cum_x, pop_ppm, share_ppm). */
  def lorenzPoints(df: DataFrame, groupCol: Column, weight: Column,
      nPoints: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nPoints >= 1, s"nPoints must be >= 1, got $nPoints")
    val sums = df.select(groupCol.as("_g"),
        coalesce(weight.cast("long"), lit(0L)).as("_w"))
      .where(col("_g").isNotNull)
      .groupBy("_g").agg(sum("_w").as("_x"))
    val ranked = globalOrderIndex(sums, "_gi", col("_x"), col("_g"))
    val tot = sums.agg(count(lit(1)).as("_n"), sum("_x").as("_tot"))
    val pts = ranked.crossJoin(broadcast(tot))
      .withColumn("point", expr(s"(_gi * $nPoints) div _n").cast("int"))
      .groupBy("point")
      .agg(count(lit(1)).as("n_groups"), sum("_x").as("x_sum"),
        max("_n").as("_n"), max("_tot").as("_tot"))
    val w = Window.orderBy("point")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts
      .withColumn("cum_n", sum("n_groups").over(w))
      .withColumn("cum_x", sum("x_sum").over(w))
      .withColumn("pop_ppm", expr("(cum_n * 1000000) div _n"))
      .withColumn("share_ppm", when(col("_tot") > 0L,
        expr("(cum_x * 1000000) div _tot")))
      .select("point", "n_groups", "x_sum", "cum_n", "cum_x",
        "pop_ppm", "share_ppm")
  }

  def splitByTag(df: DataFrame, tagCol: Column, idCol: Column): DataFrame =
    df.groupBy(tagCol.as("tag"))
      .agg(sort_array(collect_list(idCol)).as("ids"), count(lit(1)).as("n"))

  /** batch(batch_size): assign a dense batch index by global offset.
    * `zipWithIndex`-free: uses a window over a stable ordering column. */
  def batchIds(df: DataFrame, orderCol: Column, batchSize: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(orderCol)
    df.withColumn("batch_id",
      ((row_number().over(w) - 1) / batchSize).cast("long"))
  }

  /** Scale variant of batch(): partition-local batch ids with no global
    * sort — batch = (partitionId << 20) | (localIndex / size). Batches are
    * contiguous within partitions but not globally ordered; at 100 TB
    * prefer this over [[batchIds]]' total-order window. */
  def batchIdsLocal(df: DataFrame, batchSize: Int): DataFrame = {
    val out = df.withColumn("_pid", spark_partition_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_pid").orderBy(monotonically_increasing_id())
    out.withColumn("batch_id",
      (col("_pid").cast("long") * lit(1L << 20)) +
        ((row_number().over(w) - 1) / batchSize).cast("long"))
      .drop("_pid")
  }

  /** get_vocabulary: corpus term frequencies with a min-frequency floor
    * (reference: text.py:8-29; min_freq filter). Classic wordcount:
    * map-side combined, single shuffle on the token. */
  def vocabulary(df: DataFrame, textCol: Column, minFreq: Long = 1): DataFrame =
    df.select(explode(TextFunctions.tokens(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .where(col("n") >= minFreq)

  /** Deterministic dense ids for a (word, n) vocabulary, ranked by
    * (freq desc, word) — the reference's vocab-id assignment
    * (text.py:15-36) — computed fully distributed: range-partition on the
    * sort key + partition-local sort gives a global order, and RDD
    * `zipWithIndex` assigns contiguous ranks in two passes with no driver
    * collect and no single-partition window. At a 100 TB corpus the vocab
    * is tens of millions of terms; this keeps it on the cluster. Ids start
    * at `startId` (ids 0/1 stay reserved for pad/unk). */
  def rankVocabulary(vocab: DataFrame, startId: Int = 2): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    val spark = vocab.sparkSession
    val sorted = vocab
      .repartitionByRange(col("n").desc, col("word"))
      .sortWithinPartitions(col("n").desc, col("word"))
      .select(col("word"))
    val ranked = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row(r.getString(0), (i + startId).toInt)
    }
    spark.createDataFrame(ranked, StructType(Seq(
      StructField("word", StringType), StructField("vid", IntegerType))))
  }

  /** Uniform sample of ~k rows without replacement, seeded — exact-k like
    * the reference (sample.py:11-30) via rand-order + limit. At 100 TB use
    * `df.sample(fraction, seed)` instead: no global sort. */
  def sampleExact(df: DataFrame, k: Int, seed: Long): DataFrame =
    df.orderBy(rand(seed)).limit(k)

  /** shuffle = sample(len(self)) (reference: sample.py:32-39). */
  def shuffle(df: DataFrame, seed: Long): DataFrame =
    df.orderBy(rand(seed))

  /** Deterministic seeded exact-k sample: rows ordered by
    * splitmix64(key + seed). Unlike [[sampleExact]] (rand-order, stable
    * only within one engine), this is reproducible across engines and
    * layouts — the driver's DuckDB oracle hash-gates it. orderBy+limit
    * compiles to TakeOrderedAndProject: per-partition bounded top-k then
    * a k-row driver merge, no global sort — safe at 100 TB for sane k. */
  def sampleHashed(df: DataFrame, k: Int, seed: Long, key: Column): DataFrame = {
    val rk = graft.functions.splitmix64_rank(key, seed)
    df.withColumn("_rk", rk).orderBy(col("_rk")).limit(k).drop("_rk")
  }

  /** Quality-weighted subsampling: keep each row independently with
    * probability `weight` ∈ [0,1] — the "sample high-quality docs more"
    * downsampling rule (weight = a quality score, a decay by age, a
    * per-domain factor...). Deterministic and engine-portable: the draw is
    * pmod(splitmix64(key+seed), 10^6) < round(weight·10^6) — all integer
    * arithmetic after the one rounding, so the same rows survive on any
    * engine and any partitioning. Zero-shuffle scan-level filter. */
  def sampleWeighted(df: DataFrame, weight: Column, seed: Long,
      key: Column): DataFrame = {
    val u = pmod(graft.functions.splitmix64_rank(key, seed), lit(1000000L))
    df.where(u < round(weight.cast("double") * 1000000.0).cast("long"))
  }

  /** Exact-k weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006): keep the k rows with the largest u^(1/w) — each
    * row's inclusion probability is proportional to its weight, and no
    * row repeats, the draw [[sampleWeighted]] (independent keeps,
    * random output size) and `rebalanceToQuota` (with replacement)
    * don't cover. Weights are any positive scale (token counts,
    * quality scores); u comes from the gated splitmix64 chain, so the
    * sample is deterministic and layout-invariant.
    *
    * Selection rides the equivalent order ln(u)/w, quantized ONCE to
    * `es_ppb = round(1e9 · ln(u_ppm/1e6) / w)` (the q123 fixed-chain →
    * integer rule; ties → smallest key), so the chosen set replays in
    * an external engine. Rows with null or non-positive weight are
    * never selected. orderBy+limit lowers to TakeOrderedAndProject —
    * per-partition top-k heaps, never a global sort. Appends es_ppb. */
  def sampleWeightedK(df: DataFrame, k: Int, weight: Column, seed: Long,
      key: Column): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = pmod(graft.functions.splitmix64_rank(key, seed),
      lit(1000000L)) + lit(1L)
    val es = round(lit(1e9) * log(u.cast("double") / 1e6) /
      weight.cast("double")).cast("long")
    df.where(weight.isNotNull && weight > 0)
      .withColumn("es_ppb", es)
      .orderBy(col("es_ppb").desc, key)
      .limit(k)
  }

  /** Deterministic negative sampling — the contrastive / recommender
    * training-pair generator: for every distinct left key (user), draw
    * `kNeg` candidate items uniformly over the observed item-id range
    * via splitmix64(user·2^8 + j + seed), then LEFT-ANTI the user's
    * positives so no true interaction leaks in as a negative.
    * Approximate-k semantics (the word2vec/SGNS convention): a draw
    * that collides with a positive is dropped, not redrawn, so users
    * get ≤ kNeg negatives — at real item cardinalities the loss is
    * negligible and the pipeline stays two scans + one anti-join with
    * no per-user iteration.
    *
    * Deterministic, layout-invariant, engine-replayable (the q195 key
    * packing; kNeg ≤ 256 by construction). Item ids are drawn from the
    * CLOSED [min, max] id range observed in `positives` (broadcast
    * 1-row agg) — sparse id spaces draw phantom ids at the sparsity
    * rate; pass a dense id mapping upstream when that matters.
    * Output: (userCol, draw, itemCol). */
  def negativeSamples(positives: DataFrame, userCol: String,
      itemCol: String, kNeg: Int, seed: Long): DataFrame = {
    require(kNeg >= 1 && kNeg <= 256, s"kNeg must be in [1, 256], got $kNeg")
    // the draw key is user·2^8 + j: user ids ≥ 2^55 would silently wrap
    // (key collisions → correlated draws) and non-integral user columns
    // would mis-pack — the same loud in-plan guard as poissonBootstrap
    // and skipGramPairs
    val maxUser = Long.MaxValue >> 8
    val pos = positives
      .select(col(userCol).cast("long").as("_u"), col(itemCol).as("_i"))
      .where(col("_u").isNotNull && col("_i").isNotNull)
      .select(when(col("_u") < 0 || col("_u") > maxUser,
          raise_error(concat(lit("negativeSamples user id out of " +
            s"[0, 2^55) packing range: "), col("_u").cast("string"))))
          .otherwise(col("_u")).as("_u"),
        col("_i"))
    val range = broadcast(pos.agg(min("_i").as("_lo"), max("_i").as("_hi")))
    val draws = pos.select(col("_u")).distinct()
      .withColumn("draw", explode(sequence(lit(0L), lit(kNeg - 1L))))
      .crossJoin(range)
      .withColumn("_i", col("_lo") + pmod(
        graft.functions.splitmix64_rank(
          shiftleft(col("_u"), 8) + col("draw"), seed),
        col("_hi") - col("_lo") + 1L))
    draws.join(pos, Seq("_u", "_i"), "left_anti")
      .select(col("_u").as(userCol), col("draw"), col("_i").as(itemCol))
  }

  /** Stratified k-fold assignment (cross-validation / sharded-eval
    * splits): fold = (seeded rank within the stratum) mod k, so every
    * stratum's rows land EXACTLY evenly across folds (sizes differ by
    * at most 1 — the guarantee `splitHashed`'s independent draws only
    * approach in expectation) and every fold mirrors the corpus's
    * stratum mix. The rank is the gated splitmix64 order (tie → key),
    * so assignments are deterministic, layout-invariant, and
    * engine-replayable.
    *
    * One stratum-keyed window (the `rebalanceToQuota` shape — strata
    * are class labels / sources, so the per-stratum sort is bounded by
    * the largest class; for one giant unstratified series rank via
    * `globalOrderIndex` instead). Appends `fold` ∈ [0, k). */
  def kFolds(df: DataFrame, k: Int, seed: Long, key: Column,
      strataCols: Seq[String], outCol: String = "fold"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    // an empty strata list would silently become ONE global
    // single-partition window — refuse; unstratified folds are
    // pmod(splitmix64_rank(key), k) directly, no window needed
    require(strataCols.nonEmpty,
      "kFolds needs at least one stratum column; for unstratified " +
        "folds use pmod(splitmix64_rank(key, seed), k)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(graft.functions.splitmix64_rank(key, seed), key)
    df.withColumn(outCol,
      pmod(row_number().over(w).cast("long") - 1L, lit(k.toLong)))
  }

  /** Deterministic train/val/test splitting: label each row by where its
    * splitmix64 draw (the same ppm arithmetic as [[sampleWeighted]])
    * falls among the cumulative `fractions` (name → share, must sum to
    * 1). Layout-invariant, reproducible, zero-shuffle — the split
    * column is a pure scan expression, so it also serves as a partition
    * column for a split-partitioned write. Rows with a null key all land
    * in the FIRST bucket (their draw coalesces to 0) — deliberately the
    * train side, so key hygiene bugs can't contaminate a held-out split. */
  def splitHashed(df: DataFrame, key: Column, seed: Long,
      fractions: Seq[(String, Double)],
      outCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0) &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must be positive and sum to 1, got $fractions")
    val u = coalesce(
      pmod(graft.functions.splitmix64_rank(key, seed), lit(1000000L)),
      lit(0L))
    // cumulative ppm cuts, rounded once each — the exact ints the oracle
    // replays; the last bucket absorbs the rounding remainder
    val cuts = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.map(c => math.round(c * 1000000.0))
    val labeled = fractions.map(_._1).zip(cuts).init
      .foldRight(lit(fractions.last._1)) { case ((name, cut), rest) =>
        when(u < cut, lit(name)).otherwise(rest)
      }
    df.withColumn(outCol, labeled)
  }

  /** Stratified deterministic sample: at most k rows per group, drawn in
    * splitmix64(key + seed) order (key as tiebreak — unreachable for
    * integral keys, but makes the contract total). The corpus-balancing
    * step of a pretraining pipeline: cap each language/domain at k docs,
    * reproducibly across engines and data layouts. Partitioned window →
    * shuffles once on the group key, no global sort; Spark pushes the
    * rank ≤ k limit into the sort (WindowGroupLimit). */
  def sampleStratified(df: DataFrame, k: Int, seed: Long,
                       group: Column, key: Column): DataFrame = {
    val rk = graft.functions.splitmix64_rank(key, seed)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(rk, key)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k).drop("_rn")
  }

  /** Exact-quota class rebalancing: every group ends up with EXACTLY
    * `quota` rows — small groups oversample with replacement (rows
    * repeat cyclically in the seeded hash order), large groups
    * downsample to their first `quota` draws. The class-imbalance fix
    * of classifier-training pipelines, made deterministic: row with
    * seeded rank rn (1-based) appears `(quota − rn) div n + 1` times
    * (rn ≤ min(n, quota); 0 otherwise) where n is the group size — the
    * cyclic-repeat count, replayable as integer division in any engine.
    * Output: input row + `rep` (0-based copy index; `(group, key, rep)`
    * is a unique key for downstream shuffling).
    *
    * Scale shape: one group-keyed window for the seeded rank (the q58
    * WindowGroupLimit-eligible shape is lost to the explode, but the
    * window is still a single group-keyed shuffle) + a broadcast of the
    * G-row group sizes + a zero-shuffle sequence explode. Groups larger
    * than `quota` shuffle all rows into the rank but emit only `quota`.
    */
  def rebalanceToQuota(df: DataFrame, quota: Int, seed: Long,
      group: Column, key: Column): DataFrame = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    val sizes = df.groupBy(group.as("_grp")).agg(count(lit(1)).as("_n"))
    val rk = graft.functions.splitmix64_rank(key, seed)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(rk, key)
    val copies = when(col("_rn") <= least(col("_n"), lit(quota.toLong)),
      floor((lit(quota.toLong) - col("_rn")) / col("_n")) + 1L)
      .otherwise(lit(0L))
    df.withColumn("_rn", row_number().over(w).cast("long"))
      .join(broadcast(sizes), group <=> col("_grp"))
      .withColumn("_c", copies)
      .where(col("_c") > 0)
      .withColumn("rep",
        explode(sequence(lit(0L), col("_c") - 1L, lit(1L))))
      .drop("_rn", "_grp", "_n", "_c")
  }

  /** Temperature-weighted data mixing: draw ~`total` rows with per-group
    * quotas proportional to `count^alpha` — the standard multi-source
    * rebalancing rule (alpha = 1 keeps natural proportions, alpha = 0 is
    * uniform across groups, alpha ∈ (0,1) up-weights small sources the
    * way multilingual/multi-domain pretraining mixes do). Each group
    * contributes its quota's rows in splitmix64(key + seed) order, so the
    * draw is deterministic across engines and layouts; every group keeps
    * at least one row (`floor` can zero-out tiny groups).
    *
    * Scale shape: group stats are one tiny agg (G rows, G = #sources);
    * quotas broadcast-join back onto the corpus; the per-group draw is
    * one partitioned window — a single shuffle on the group key, same as
    * [[sampleStratified]] (the per-group quota is a column, so the
    * literal-only WindowGroupLimit rewrite doesn't fire — the sort is
    * still per-group, never global). `alpha = 0.5` is special-cased to
    * `sqrt`,
    * which is IEEE-correctly-rounded (`pow(x, 0.5)` is not) and thus
    * bit-reproducible against any other engine. */
  def sampleTemperature(df: DataFrame, total: Long, alpha: Double,
                        seed: Long, group: Column, key: Column): DataFrame =
    sampleTemperatureBySize(df, total, alpha, seed, group, key, lit(1L))

  /** [[sampleTemperature]] with group mass = `sum(size)` instead of the
    * row count — quota ∝ (token mass)^alpha is how the real mixing
    * rules weigh sources (a source of few huge docs should not be
    * upsampled like a small one). `size = lit(1)` degenerates to the
    * doc-count rule exactly (sum(1) ≡ count). */
  def sampleTemperatureBySize(df: DataFrame, total: Long, alpha: Double,
      seed: Long, group: Column, key: Column, size: Column): DataFrame = {
    require(total >= 1 && alpha >= 0.0)
    def weight(n: Column): Column =
      if (alpha == 0.5) sqrt(n.cast("double"))
      else if (alpha == 1.0) n.cast("double")
      else if (alpha == 0.0) lit(1.0)
      else pow(n.cast("double"), lit(alpha))
    val quotas = df.groupBy(group.as("_grp"))
      .agg(sum(size.cast("long")).as("_n"))
      .withColumn("_wsum", sum(weight(col("_n"))).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("_grp"), greatest(lit(1L),
        floor(weight(col("_n")) / col("_wsum") * total)).as("_take"))
    val rk = graft.functions.splitmix64_rank(key, seed)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(rk, key)
    // null-safe: a null group key is a group like any other (the sibling
    // sampleStratified's window keeps it) — a plain === would silently
    // drop every null-keyed row from the draw
    df.join(broadcast(quotas), group <=> col("_grp"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= col("_take"))
      .drop("_grp", "_take", "_rn")
  }

  /** Exact global position (0-based) of every row under `sortCols` —
    * the scale-safe replacement for `row_number() OVER (ORDER BY …)`,
    * whose empty window frame is a single-partition sort: here the sort
    * is a range-repartition + local sorts, and positions come from
    * zipWithIndex's partition-offset pass (one extra count job, no
    * data movement). Deterministic when `sortCols` is a total order
    * (include a unique key as the last column). The q60 exact-NTILE
    * pattern, generalized. */
  def globalOrderIndex(df: DataFrame, name: String,
      sortCols: Column*): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(name, LongType, nullable = false))
    sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }

  /** Per-row robust z-score by group — (v − median)/(1.4826·MAD), the
    * outlier scale that a heavy tail cannot corrupt (mean/std blow up
    * with the whale; median/MAD don't). Kept EXACTLY integral until
    * the last division by doubling twice: med2 = lower+upper middle of
    * v (so 2·median), dev = |2v − med2| (= 2|v − median|, integer),
    * mad2 = lower+upper middle of dev (= 4·MAD, integer); then
    * z = 2·(2v − med2)/(1.4826·mad2) is ONE float chain per row.
    * mad2 = 0 (a majority-constant group) → null z, the
    * robustAnomalies convention. Two group-partitioned rank windows,
    * never global. Returns every input row +
    * (v, med2, mad2, z). */
  def robustZ(df: DataFrame, groupCols: Seq[String], idCol: String,
      value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(groupCols.map(col) :+ col(idCol) :+
        value.cast("long").as("v"): _*)
      .where(col("v").isNotNull)
    def doubledMedian(in: DataFrame, c: String, out: String): DataFrame = {
      val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(c))
      val wAll = Window.partitionBy(groupCols.map(col): _*)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val ranked = in.withColumn("_rn", row_number().over(w))
        .withColumn("_cnt", count(lit(1)).over(wAll))
      // Column./ on longs is DOUBLE division — floor'd (the olsDummy rule)
      val lo = floor((col("_cnt") + 1L) / 2L).cast("long")
      val hi = floor(col("_cnt") / 2L).cast("long") + 1L
      ranked.groupBy(groupCols.map(col): _*).agg(
        (coalesce(sum(when(col("_rn") === lo, col(c))), lit(0L)) +
          coalesce(sum(when(col("_rn") === hi, col(c))), lit(0L)))
          .as(out))
    }
    val med = doubledMedian(base, "v", "med2")
    val withDev = base.join(med, groupCols)
      .withColumn("dev", abs(lit(2L) * col("v") - col("med2")))
    val mad = doubledMedian(withDev, "dev", "mad2")
    withDev.join(mad, groupCols)
      .withColumn("z", when(col("mad2") > 0L,
        lit(2.0) * (lit(2L) * col("v") - col("med2")).cast("double") /
          (lit(1.4826) * col("mad2").cast("double"))))
      .drop("dev")
  }

  /** Per-group winsorization — clamp an integer measure at exact
    * rational quantile bounds (the outlier-tolerant cleaning TRANSFORM
    * beside q241's trimmed-mean statistic): bound(q = num/den) = the
    * smallest value whose cumulative count reaches ceil(q·n), selected
    * in exact integer arithmetic over the per-(group, value) COUNT
    * GRID (the q119/q253 discipline — windows run over distinct
    * values, never data rows), then one map-side clamp join back.
    *
    * Returns the input columns plus (`lo`, `hi`, `v_w`). */
  def winsorize(df: DataFrame, groupCols: Seq[String], value: Column,
      loNum: Int, loDen: Int, hiNum: Int, hiDen: Int): DataFrame = {
    require(loDen > 0 && hiDen > 0 && loNum >= 0 && hiNum >= 0 &&
      loNum <= loDen && hiNum <= hiDen && loNum * hiDen <= hiNum * loDen,
      s"bad quantile bounds ($loNum/$loDen, $hiNum/$hiDen)")
    val base = df.select(groupCols.map(col) :+ value.cast("long").as("_v"): _*)
      .where(col("_v").isNotNull)
    val grid = base.groupBy(groupCols.map(col) :+ col("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("_v"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    val bounds = grid
      .withColumn("_cum", sum("_c").over(w))
      .withColumn("_n", sum("_c").over(wAll))
      .groupBy(groupCols.map(col): _*)
      .agg(
        min(when(col("_cum") >=
          expr(s"(_n * $loNum + $loDen - 1) div $loDen"), col("_v")))
          .as("lo"),
        min(when(col("_cum") >=
          expr(s"(_n * $hiNum + $hiDen - 1) div $hiDen"), col("_v")))
          .as("hi"))
    df.select(df.columns.map(col) :+ value.cast("long").as("_v"): _*)
      .where(col("_v").isNotNull)
      .join(bounds, groupCols)
      .withColumn("v_w", greatest(col("lo"), least(col("hi"), col("_v"))))
      .drop("_v")
  }

  /** Leave-one-out + smoothed target encoding — the leakage-safe
    * categorical featurizer (the mean-encoding every tabular training
    * pipeline reaches for): per row, the target mean of the row's
    * category EXCLUDING the row itself, plus the m-smoothed blend with
    * the global prior.
    *
    * Kept engine-exact end to end: per-category n_c/S_c and global N/S
    * are exact integer aggregates; the LOO encoding is ONE division of
    * exact integers ((S_c − y) / (n_c − 1), null for singletons —
    * nothing to leave out); the smoothed encoding cross-multiplies the
    * prior away — ((S_c − y)·N + m·S) / ((n_c − 1 + m)·N) — so its
    * numerator/denominator are exact Decimal(38,0) integers and the
    * value is again ONE division. Both num/den pairs ship alongside
    * the doubles for integer-exact gating.
    *
    * Scale shape: one category aggregate (map-side combined, output
    * bounded by category cardinality), one broadcast-sized join back
    * (AQE broadcasts it when it fits) + one 1-row global crossJoin —
    * map-only after that, no windows, no per-row state.
    *
    * Returns the id/category columns plus (n_c, loo_num, loo_den,
    * te_loo, sm_num, sm_den, te_smooth). */
  def targetEncode(df: DataFrame, idCol: String, category: Column,
      y: Column, m: Long = 10L): DataFrame = {
    require(m >= 0L, s"smoothing m must be >= 0, got $m")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.select(col(idCol), category.as("cat"), y.cast("long").as("_y"))
      .where(col("cat").isNotNull && col("_y").isNotNull)
    val cats = base.groupBy("cat")
      .agg(count(lit(1)).as("n_c"), sum("_y").as("_sc"))
    val glob = base.agg(count(lit(1)).as("_n"), sum("_y").as("_s"))
    base.join(cats, Seq("cat"))
      .crossJoin(broadcast(glob))
      .withColumn("loo_num", col("_sc") - col("_y"))
      .withColumn("loo_den", col("n_c") - 1L)
      .withColumn("te_loo", when(col("loo_den") > 0L,
        col("loo_num").cast("double") / col("loo_den").cast("double")))
      .withColumn("sm_num",
        dec(col("loo_num")) * col("_n") + dec(lit(m)) * col("_s"))
      .withColumn("sm_den", dec(col("loo_den") + m) * col("_n"))
      .withColumn("te_smooth", when(col("sm_den") =!= lit(0L),
        col("sm_num").cast("double") / col("sm_den").cast("double")))
      .select(col(idCol), col("cat"), col("n_c"), col("loo_num"),
        col("loo_den"), col("te_loo"), col("sm_num"), col("sm_den"),
        col("te_smooth"))
  }

  /** Walk-forward (expanding-window) cross-validation fold boundaries
    * over a bucketed time axis — the temporal split that [[kFolds]]'s
    * random assignment must NEVER be used for (a random fold leaks the
    * future into training; finance calls the fix an embargo). The span
    * [b0, b1] splits into nFolds+1 equal segments (integer div); fold
    * k trains on [b0, b0+k*seg − embargo), skips the embargo gap, and
    * tests on [b0+k*seg, b0+(k+1)*seg) — the LAST fold's test absorbs
    * the remainder through b1. Refuses when the span is thinner than
    * nFolds+1 buckets. One bounded grid aggregation + a grid×nFolds
    * conditional rollup — the event data shuffles once onto the
    * bucket grid and never again. Returns one row per fold:
    * (fold, train_end, test_start, test_end, n_train, n_embargoed,
    * n_test). Bounds are exclusive ends; assign rows downstream with
    * bucket < train_end etc. */
  def walkForwardFolds(df: DataFrame, bucket: Column, nFolds: Int,
      embargo: Long = 0L): DataFrame = {
    require(nFolds >= 1, s"nFolds must be >= 1, got $nFolds")
    require(embargo >= 0L, s"embargo must be >= 0, got $embargo")
    val grid = df.select(bucket.cast("long").as("_b"))
      .where(col("_b").isNotNull)
      .groupBy("_b").agg(count(lit(1)).as("_c"))
    val span = grid.agg(min("_b").as("_b0"), max("_b").as("_b1"))
      .withColumn("_seg", expr(s"(_b1 - _b0 + 1) div ${nFolds + 1}L"))
      .withColumn("_seg", when(col("_seg") >= 1L, col("_seg"))
        .otherwise(raise_error(concat(
          lit(s"walkForwardFolds: span thinner than ${nFolds + 1} buckets: "),
          (col("_b1") - col("_b0") + 1L).cast("string")))))
    val folds = span
      .select(explode(sequence(lit(1L), lit(nFolds.toLong))).as("fold"),
        col("_b0"), col("_b1"), col("_seg"))
      .withColumn("test_start", col("_b0") + col("fold") * col("_seg"))
      .withColumn("train_end", col("test_start") - lit(embargo))
      .withColumn("test_end",
        when(col("fold") === nFolds.toLong, col("_b1") + 1L)
          .otherwise(col("_b0") + (col("fold") + 1L) * col("_seg")))
    folds.crossJoin(grid)
      .groupBy("fold", "train_end", "test_start", "test_end")
      .agg(
        sum(when(col("_b") < col("train_end"), col("_c")).otherwise(0L))
          .as("n_train"),
        sum(when(col("_b") >= col("train_end") &&
          col("_b") < col("test_start"), col("_c")).otherwise(0L))
          .as("n_embargoed"),
        sum(when(col("_b") >= col("test_start") &&
          col("_b") < col("test_end"), col("_c")).otherwise(0L))
          .as("n_test"))
  }

  /** Effective sample size of an importance-weighted corpus — the
    * one-number diagnostic every weighting scheme ([[Dsir]] scores,
    * Moore-Lewis, IPW, [[ipfWeights]]) must report before anyone
    * trusts a weighted mean: ESS = (Σw)²/Σw² (Kish), the equivalent
    * count of EQUALLY-weighted samples. A few huge weights → ESS ≪ n →
    * the weighted estimate rides on a handful of rows. Weights arrive
    * as exact quantized longs (the ppm contract); both sums accumulate
    * in Decimal(38,0), ESS is ONE float chain. Negative weights are a
    * caller bug → in-plan raise_error. Returns one row:
    * (n, sw, sw2 — decimals, gate-cast downstream — ess, ess_ratio). */
  def essWeights(df: DataFrame, weight: Column): DataFrame = {
    val w = df.select(weight.cast("long").as("_w"))
      .where(col("_w").isNotNull)
      .withColumn("_w", when(col("_w") >= 0L, col("_w"))
        .otherwise(raise_error(concat(
          lit("essWeights: negative weight: "),
          col("_w").cast("string")))))
    w.agg(count(lit(1)).as("n"),
        coalesce(sum(col("_w").cast("decimal(38,0)")),
          lit(0L).cast("decimal(38,0)")).as("sw"),
        coalesce(sum(col("_w").cast("decimal(38,0)") *
          col("_w").cast("decimal(38,0)")),
          lit(0L).cast("decimal(38,0)")).as("sw2"))
      .withColumn("ess", when(col("sw2").cast("double") > 0.0,
        col("sw").cast("double") * col("sw").cast("double") /
          col("sw2").cast("double")))
      .withColumn("ess_ratio", when(col("n") > 0L,
        col("ess") / col("n").cast("double")))
  }

  /** Iterative proportional fitting (survey raking) over a two-way
    * cell grid — reweight a corpus so BOTH marginal distributions hit
    * caller targets (topic × language to a product spec, priority ×
    * status to uniform): the dataset-curation move when per-cell
    * targets are underdetermined and only margins are known. Cells
    * (r, c, n) come from ONE data-sized groupBy; every IPF sweep runs
    * on the bounded grid. Weights live as ppm longs (w⁰ = 10⁶);
    * each half-step scales one margin to its target —
    * f = t_ppm·Σmass/(10⁶·mass_margin), ONE float chain off exact
    * integer masses, w' = round(w·f) quantized ONCE per half-step —
    * so any iteration count is layout-invariant and engine-replayable
    * (rows first, then columns, `iters` full sweeps). Margins with
    * target > 0 but zero observed mass cannot be raked → in-plan
    * raise_error; zero-target margins zero out. Returns
    * (r, c, n, w_ppm). */
  def ipfWeights(cells: DataFrame, rowTargets: DataFrame,
      colTargets: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val base = cells.select(col("r"), col("c"),
        col("n").cast("long").as("n"))
      .where(col("r").isNotNull && col("c").isNotNull && col("n") > 0L)
      .withColumn("w_ppm", lit(1000000L))
    val rt = rowTargets.select(col("r"), col("t_ppm").cast("long")
      .as("_rt"))
    val ct = colTargets.select(col("c"), col("t_ppm").cast("long")
      .as("_ct"))
    def half(df: DataFrame, key: String, targets: DataFrame,
        tName: String): DataFrame = {
      val mass = df.groupBy(key)
        .agg(sum(col("n").cast("decimal(38,0)") *
          col("w_ppm").cast("decimal(38,0)")).as("_m"))
      val total = mass.agg(sum("_m").as("_tm"))
      df.join(targets, Seq(key))
        .join(mass, Seq(key)).crossJoin(broadcast(total))
        .withColumn("_f",
          when(col(tName) === 0L, lit(0.0))
            .when(col("_m").cast("double") > 0.0,
              col(tName).cast("double") * col("_tm").cast("double") /
                (lit(1e6) * col("_m").cast("double")))
            .otherwise(raise_error(concat(
              lit("ipfWeights: target > 0 on an empty margin: "),
              col(key).cast("string")))))
        .withColumn("w_ppm",
          round(col("w_ppm").cast("double") * col("_f")).cast("long"))
        .select("r", "c", "n", "w_ppm")
    }
    // each half-step references the running frame twice (margin agg +
    // join back), so the raw plan DAG doubles per step — the standard
    // iterative-op lineage cut keeps analysis linear (the pageRank /
    // kCore discipline; the grid is bounded, so the cut is cheap)
    import graft.operators.Checkpoints.LineageCutOps
    var cur = base
    for (_ <- 1 to iters) {
      cur = half(cur, "r", rt, "_rt").cutLineage(eager = true)
      cur = half(cur, "c", ct, "_ct").cutLineage(eager = true)
    }
    cur
  }
}
