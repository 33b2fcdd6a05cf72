package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{fnv64, kmv_estimate, kmv_sketch, splitmix64_rank}

/** KMV (bottom-k minimum values) distinct-count sketches: bounded-memory,
  * mergeable cardinality estimation over arbitrary keys — vocabulary size,
  * unique URLs/domains/n-grams per corpus slice at 100 TB, where an exact
  * `count(distinct)` would shuffle every distinct key.
  *
  * The hash space is the engine-portable FNV-1a → splitmix64 chain already
  * gated by q46/q52, so a sketch is replayable bit-for-bit in an external
  * SQL engine, and the estimate — (k−1)·2^64 / kth-minimum-unsigned-hash,
  * exact integer floor division ([[graft.functions.KmvEstimate]]) — is
  * deterministic and layout-invariant.
  *
  * Scale shape: ONE aggregation ([[graft.functions.KmvSketchAgg]] — a
  * bounded distinct-bottom-k buffer, dedup inside the heap) with map-side
  * combine, so the only shuffle moves ≤ k longs per (partition, group) —
  * no separate distinct pass, no per-group sort, no window. Sketches
  * (bottom-k arrays) union losslessly: the bottom-k of a union is a
  * function of the per-part bottom-k's, which makes per-shard/per-day
  * sketch artifacts combinable without re-reading the data.
  */
object Sketch {

  /** Engine-portable 64-bit hash of a string key: splitmix64(fnv64(key) + seed). */
  def keyHash(key: Column, seed: Long = 0L): Column =
    splitmix64_rank(fnv64(key), seed)

  // The functions-API shift operators only take constant Int amounts;
  // these bridge the column-amount forms (1L << amt, v >>> amt).
  private def shl1(amount: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        org.apache.spark.sql.catalyst.expressions.Literal(1L),
        org.apache.spark.sql.graft.Bridge.expression(amount)))

  private def shru(v: Column, amount: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftRightUnsigned(
        org.apache.spark.sql.graft.Bridge.expression(v),
        org.apache.spark.sql.graft.Bridge.expression(amount)))

  // signed ↔ unsigned order flip: XOR the sign bit, then signed order on the
  // flipped value equals unsigned order on the original (both engines).
  private def flip(c: Column): Column = c.bitwiseXOR(lit(Long.MinValue))

  /** Materialized sketch artifact: per group ONE row with `kmv` = the
    * distinct bottom-k signed hashes in ascending unsigned order (≤ k
    * elements). One aggregation, one bounded shuffle. Store per
    * shard/day; [[kmvMerge]] combines without data re-reads. */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], hash: Column,
      k: Int): DataFrame =
    df.select(groupCols.map(col) :+ hash.as("_h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(kmv_sketch(col("_h"), k).as("kmv"))

  /** Per-group bottom-k rows of distinct (unsigned) hashes: (groupCols…,
    * `_h`) with at most k rows per group — [[kmvSketch]] exploded. */
  def kmvBottomK(df: DataFrame, groupCols: Seq[String], hash: Column,
      k: Int): DataFrame =
    kmvSketch(df, groupCols, hash, k)
      .select(groupCols.map(col) :+ explode(col("kmv")).as("_h"): _*)

  /** Distinct-count estimate per group: (groupCols…, k_actual, kth_hash,
    * est_distinct). Groups with fewer than k distinct hashes report the
    * exact count (the sketch saw everything); otherwise the KMV estimator
    * fires on the kth minimum. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], hash: Column,
      k: Int): DataFrame =
    kmvSketch(df, groupCols, hash, k)
      .select((groupCols.map(col) :+
        size(col("kmv")).cast("long").as("k_actual") :+
        // a group whose hashes were all null has an EMPTY sketch —
        // element_at(kmv, 0) would throw; its kth hash is simply absent
        when(size(col("kmv")) > 0,
          element_at(col("kmv"), size(col("kmv")))).as("kth_hash")): _*)
      .withColumn("est_distinct",
        when(col("k_actual") < k, col("k_actual"))
          .otherwise(kmv_estimate(col("kth_hash"), k)))

  /** String-key convenience: hash with [[keyHash]] then [[kmvDistinct]]. */
  def kmvDistinctStrings(df: DataFrame, groupCols: Seq[String], key: Column,
      k: Int, seed: Long = 0L): DataFrame =
    kmvDistinct(df, groupCols, keyHash(key, seed), k)

  /** Bottom-k (unsigned order) of an array of signed hashes: the single
    * definition both [[kmvMerge]] and [[kmvJaccard]] build on — one
    * sign-flip/sort/unflip encoding, not two drifting copies. */
  private def unionBottomK(arr: Column, k: Int): Column =
    slice(
      transform(
        sort_array(array_distinct(transform(arr,
          x => x.bitwiseXOR(lit(Long.MinValue))))),
        x => x.bitwiseXOR(lit(Long.MinValue))),
      1, k)

  /** Union sketches that share a group key: lossless bottom-k of the union
    * of the per-part bottom-k arrays (distinct, unsigned sort, cut at k). */
  def kmvMerge(sketches: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(unionBottomK(flatten(collect_list(col("kmv"))), k).as("kmv"))

  /** Estimate column over a sketch array (from [[kmvSketch]]/[[kmvMerge]]). */
  def kmvEstimateFromSketch(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("long"))
      .otherwise(kmv_estimate(element_at(kmv, k), k))

  /** Jaccard similarity estimate between two bottom-k sketches (Beyer et
    * al. 2007): over M = the bottom-k of the sketch union (an unbiased
    * uniform sample of A ∪ B), J ≈ |{m ∈ M : m ∈ A_k ∧ m ∈ B_k}| / |M|.
    * Deterministic (no RNG — the "sample" is the hash order) and exact
    * rational → one double division, so an external engine replays it
    * bit-for-bit. This is the cross-corpus overlap/contamination-rate
    * estimator that needs NO join of the raw data — two k-long arrays
    * per corpus slice, composable over [[kmvMerge]]d shards. */
  def kmvJaccard(a: Column, b: Column, k: Int): Column = {
    val union = unionBottomK(concat(a, b), k)
    val inBoth = size(filter(union,
      x => array_contains(a, x) && array_contains(b, x)))
    when(size(union) === 0, lit(0.0))
      .otherwise(inBoth.cast("double") / size(union).cast("double"))
  }

  /** All-pairs overlap estimates between the groups of a sketch table
    * (from [[kmvSketch]]): (ga, gb, jaccard) for every unordered group
    * pair — |G|² sketch-array comparisons, never a data join. */
  def kmvOverlapPairs(sketches: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    val a = sketches.select(col(groupCol).as("ga"), col("kmv").as("_ka"))
    val b = sketches.select(col(groupCol).as("gb"), col("kmv").as("_kb"))
    a.crossJoin(b).where(col("ga") < col("gb"))
      .select(col("ga"), col("gb"),
        kmvJaccard(col("_ka"), col("_kb"), k).as("jaccard"))
  }

  // ------------------------------------------------------------------
  // HyperLogLog (Flajolet et al. 2007): fixed-size (2^p registers)
  // mergeable cardinality sketches over the same engine-portable hash
  // space as KMV. Where KMV keeps k hash VALUES (enabling Jaccard /
  // overlap estimation), HLL keeps only max-leading-zero ranks — 2^p
  // bytes per group regardless of k, the shape for per-partition /
  // per-day register artifacts that an OR-free `zip_with(max)` merges.
  // Registers are pure integer state (bucket = top p hash bits, rho =
  // leading zeros of the remaining 64-p bits + 1), so a sketch is
  // replayable bit-for-bit by an external SQL engine; the estimate has
  // exactly ONE rounding (a single double division over an exact
  // integer harmonic denominator), plus the standard linear-counting
  // branch below 2.5·m.
  // ------------------------------------------------------------------

  /** (bucket, rho) of a signed 64-bit hash under 2^p buckets: bucket =
    * top p bits (unsigned), rho = leading-zero count of the remaining
    * 64-p bits + 1 (the all-zero remainder maps to 64-p+1). Pure
    * integer/bit ops — `bin()` length is the engine-portable bit-length. */
  def hllBucket(hash: Column, p: Int): Column =
    shiftrightunsigned(hash, 64 - p).cast("int")

  def hllRho(hash: Column, p: Int): Column = {
    val rem = hash.bitwiseAND(lit((1L << (64 - p)) - 1L))
    // window-clz + 1; the all-zero remainder (bit length 0) falls out
    // of the same formula. bit_length64 is the codegen'd arithmetic
    // equal of length(bin(rem)) — the oracle replays the string form.
    (lit(64 - p + 1) - graft.functions.bit_length64(rem)).cast("int")
  }

  /** Sparse register table: one row per (group, non-empty bucket) with
    * `reg` = max rho seen. ONE aggregation with map-side combine — the
    * shuffle moves ≤ 2^p ints per (partition, group). Absent buckets
    * are register 0. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], hash: Column,
      p: Int): DataFrame =
    df.select(groupCols.map(col) :+ hash.as("_h"): _*)
      .where(col("_h").isNotNull)
      .groupBy(groupCols.map(col) :+ hllBucket(col("_h"), p).as("bucket"): _*)
      .agg(max(hllRho(col("_h"), p)).as("reg"))

  /** Dense sketch artifact: per group ONE row with `hll` = the full
    * 2^p-register array (0 = empty bucket), bucket-ascending. ONE
    * [[graft.functions.HllSketchAgg]] aggregation — bucket/rho computed
    * inside the update loop, map-side combine ships ≤ 2^p bytes per
    * (partition, group) into the only shuffle. The storable / mergeable
    * form; register-identical to [[hllRegisters]] densified
    * (spec-asserted). */
  def hllSketch(df: DataFrame, groupCols: Seq[String], hash: Column,
      p: Int): DataFrame =
    df.select(groupCols.map(col) :+ hash.as("_h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.hll_sketch(col("_h"), p).as("hll"))

  /** Union sketches that share a group key: element-wise register max —
    * lossless (the register of a union is the max of the registers), so
    * per-shard/per-day artifacts combine without re-reading data. */
  def hllMerge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(aggregate(collect_list(col("hll")),
        typedLit(Seq.empty[Int]),
        (acc, regs) => when(size(acc) === 0, regs)
          .otherwise(zip_with(acc, regs, (a, b) => greatest(a, b))))
        .as("hll"))

  /** Cardinality estimate over a dense register array: the raw HLL
    * estimator alpha_m·m²/Σ2^−reg with the harmonic denominator kept as
    * an EXACT integer (Σ 2^(W−reg), W = 64−p+1, Decimal(38,0) — order-
    * independent, no float accumulation), one double division, and the
    * standard linear-counting switch (V = empty buckets) below 2.5·m.
    * Every operation order is fixed so an external engine replays the
    * exact double. */
  def hllEstimateFromRegs(hll: Column, p: Int): Column = {
    val m = 1 << p
    val w = 64 - p + 1
    // 2^(w−reg) fits a long (reg ≥ 0 ⇒ ≤ 2^57 at p=8); the SUM needs
    // decimal (≤ m·2^w). expr: the functions API only takes Int shifts.
    val zInt = aggregate(hll,
      lit(java.math.BigDecimal.ZERO).cast(org.apache.spark.sql.types.DecimalType(38, 0)),
      (acc, r) => acc + shl1(lit(w) - r)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
    val nZero = size(filter(hll, r => r === 0))
    // alpha·m² is exact up to the alpha literal (×2^(16) shifts exponent
    // only); ONE rounding happens in the division.
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val raw = alpha * lit(m.toDouble * m.toDouble) *
      lit(math.pow(2.0, w)) / zInt.cast("double")
    when(nZero > 0 && raw <= lit(2.5 * m),
      lit(m.toDouble) * log(lit(m.toDouble) / nZero.cast("double")))
      .otherwise(raw)
  }

  /** Per-group scalar summary gateable as integers: register count /
    * sum / bucket-weighted sum (an order-free checksum of the whole
    * register table), empty-bucket count, and the estimate. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], hash: Column,
      p: Int): DataFrame =
    hllSketch(df, groupCols, hash, p)
      .select(groupCols.map(col) :+
        size(filter(col("hll"), r => r > 0)).as("n_reg") :+
        aggregate(col("hll"), lit(0L), (a, r) => a + r).as("reg_sum") :+
        aggregate(zip_with(
            sequence(lit(0), lit((1 << p) - 1)), col("hll"),
            (b, r) => b.cast("long") * r),
          lit(0L), (a, x) => a + x).as("reg_wsum") :+
        size(filter(col("hll"), r => r === 0)).as("n_zero") :+
        hllEstimateFromRegs(col("hll"), p).as("est_hll"): _*)

  /** String-key convenience: [[keyHash]] then [[hllDistinct]]. */
  def hllDistinctStrings(df: DataFrame, groupCols: Seq[String], key: Column,
      p: Int, seed: Long = 0L): DataFrame =
    hllDistinct(df, groupCols, keyHash(key, seed), p)

  // ------------------------------------------------------------------
  // Count-min sketch (Cormode & Muthukrishnan 2005): fixed-size
  // (depth × width counters) FREQUENCY estimation — "how often does
  // key x occur" without a full groupBy of every distinct key. The
  // counters are exact integer sums, so the whole sketch — and every
  // point estimate (min over depth rows) — is deterministic and
  // layout-invariant: an external engine replaying the same hash
  // chain reproduces it bit-for-bit. Estimates never undercount;
  // overcount is bounded by collision mass (~N/width per row, the
  // min over `depth` independent rows drives it down).
  //
  // Scale shape: ONE distinct-key pre-aggregation (the 100 TB corpus
  // collapses to its vocabulary before hashing), then depth hashed
  // re-keyings of the ≤ depth·width counter space — the shuffle after
  // partial aggregation is ≤ depth·width rows per partition. Sketches
  // with the same (depth, width, seed) merge by counter addition.
  // ------------------------------------------------------------------

  /** Build: (row, bucket, cell) counters over occurrences of `key`.
    * `width` must be a power of two (bucket = low bits of the row-seeded
    * splitmix hash — two's-complement low bits are engine-portable). */
  def cmSketch(df: DataFrame, key: Column, depth: Int, width: Int,
      seed: Long = 0L): DataFrame = {
    require(width > 0 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    val cnt = df.select(key.as("_w")).where(col("_w").isNotNull)
      .groupBy("_w").agg(count(lit(1)).as("_c"))
    val rows = explode(array((0 until depth).map { i =>
      struct(lit(i).as("_row"),
        keyHash(col("_w"), seed + i).bitwiseAND(lit((width - 1).toLong))
          .cast("int").as("_bucket"))
    }: _*)).as("_rb")
    cnt.select(col("_c"), rows)
      .groupBy(col("_rb._row").as("row"), col("_rb._bucket").as("bucket"))
      .agg(sum("_c").as("cell"))
  }

  /** Point-frequency estimates for `keys` (a one-column DataFrame of
    * probe keys): min over the depth counter rows, 0 when a bucket was
    * never touched. The sketch side is ≤ depth·width rows — broadcast. */
  def cmEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int, seed: Long = 0L): DataFrame = {
    val probes = keys.select(col(keyCol).as("_w")).where(col("_w").isNotNull)
      .distinct()
      .select(col("_w"), explode(array((0 until depth).map { i =>
        struct(lit(i).as("_row"),
          keyHash(col("_w"), seed + i).bitwiseAND(lit((width - 1).toLong))
            .cast("int").as("_bucket"))
      }: _*)).as("_rb"))
      .select(col("_w"), col("_rb._row").as("row"), col("_rb._bucket").as("bucket"))
    probes.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("_w")
      .agg(min(coalesce(col("cell"), lit(0L))).as("est_cm"))
      .withColumnRenamed("_w", keyCol)
  }

  /** Equi-join SIZE estimation from two count-min sketches (the AGMS /
    * CM inner-product estimator, Cormode & Muthukrishnan 2005 §4.2):
    * |A ⋈ B| on a key = Σ_k cntA(k)·cntB(k), estimated as min over the
    * depth rows of Σ_b cellA[b]·cellB[b]. Never underestimates;
    * collisions only add. The plan-time cardinality probe at 100 TB —
    * two ≤ depth·width counter tables answer "how big would this join
    * be" with NO scan of either table, and sketches persist/merge per
    * shard. Exact integer products (Decimal(38,0) sums), so the
    * estimate replays bit-for-bit externally.
    *
    * Both sketches must share (depth, width, seed). Returns one row:
    * (`est_join_rows`). */
  def cmJoinSize(a: DataFrame, b: DataFrame, depth: Int): DataFrame = {
    val x = a.select(col("row"), col("bucket"), col("cell").as("_ca"))
    val y = b.select(col("row"), col("bucket"), col("cell").as("_cb"))
    val rows = a.sparkSession.range(0, depth)
      .select(col("id").cast("int").as("row"))
    val perRow = x.join(y, Seq("row", "bucket"))
      .groupBy("row")
      .agg(sum(col("_ca").cast("decimal(38,0)") * col("_cb")).as("_p"))
    // a hash row with NO shared bucket proves the join is empty — it
    // must enter the min as 0, not vanish from it
    rows.join(perRow, Seq("row"), "left")
      .select(coalesce(col("_p"), lit(0L).cast("decimal(38,0)")).as("_p"))
      .agg(min(col("_p")).cast("decimal(38,0)").as("est_join_rows"))
  }

  // ------------------------------------------------------------------
  // Mergeable log-scale histograms: pure-integer value binning (bin =
  // bit-length bucket × 2^subBits sub-buckets from the bits after the
  // MSB — ≤ 1/2^subBits relative bin width) for quantile estimation
  // over non-negative integer measures (doc lengths, token counts,
  // byte sizes) at corpus scale. ONE groupBy(bin) aggregation whose
  // map-side combine collapses each partition to ≤ ~64·2^subBits rows;
  // histograms merge by count addition; quantile selection — smallest
  // bin whose cumulative count reaches ceil(q·N), ties and targets in
  // exact integer arithmetic — is layout-invariant and replayable.
  // ------------------------------------------------------------------

  /** Bin id of a non-negative integer value: values < 2^subBits map to
    * themselves (exact); otherwise (bitlen − subBits)·2^subBits + the
    * subBits bits after the MSB. Monotone in the value, so bin order =
    * value order. Negative / null values yield null (dropped by
    * [[logHistogram]]). */
  def logBin(value: Column, subBits: Int): Column = {
    val v = value.cast("long")
    val small = 1L << subBits
    val e = graft.functions.bit_length64(v) // codegen'd; = length(bin(v)) for v > 0
    when(v.isNull || v < 0, lit(null).cast("int"))
      .when(v < small, v.cast("int"))
      .otherwise(((e - subBits) * lit(1 << subBits)).cast("int") +
        shru(v, e - (subBits + 1))
          .bitwiseAND(lit((1L << subBits) - 1L)).cast("int"))
  }

  /** Inclusive lower / exclusive upper value bounds of a bin id. */
  def logBinLo(bin: Column, subBits: Int): Column = {
    val m = 1 << subBits
    when(bin < m, bin.cast("long"))
      .otherwise((bin.bitwiseAND(lit(m - 1)).cast("long") + m) *
        shl1(shiftright(bin.cast("int"), subBits) - 1))
  }

  def logBinHi(bin: Column, subBits: Int): Column = {
    val m = 1 << subBits
    when(bin < m, bin.cast("long") + 1L)
      .otherwise(logBinLo(bin, subBits) +
        shl1(shiftright(bin.cast("int"), subBits) - 1))
  }

  /** Histogram artifact: (group…, bin, cnt) over non-negative `value`s. */
  def logHistogram(df: DataFrame, groupCols: Seq[String], value: Column,
      subBits: Int = 4): DataFrame =
    df.select(groupCols.map(col) :+ logBin(value, subBits).as("bin"): _*)
      .where(col("bin").isNotNull)
      .groupBy(groupCols.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge histograms sharing (group, bin): count addition. */
  def histMerge(hists: DataFrame, groupCols: Seq[String]): DataFrame =
    hists.groupBy(groupCols.map(col) :+ col("bin"): _*)
      .agg(sum("cnt").as("cnt"))

  /** Quantile bins per group for rational quantiles q = num/den: the
    * smallest bin whose cumulative count ≥ ceil(q·N) (exact integers
    * throughout — target = (N·num + den − 1) div den). The window runs
    * over the HISTOGRAM (≤ ~64·2^subBits rows per group), never the
    * data. Returns (group…, q_num, q_den, target, bin, lo, hi). */
  def histQuantiles(hist: DataFrame, groupCols: Seq[String],
      qs: Seq[(Int, Int)], subBits: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("bin"))
    val cum = hist
      .withColumn("_cum", sum("cnt").over(w))
      .withColumn("_n", sum("cnt").over(
        Window.partitionBy(groupCols.map(col): _*)))
    val quants = qs.map { case (n, d) =>
      struct(lit(n).as("q_num"), lit(d).as("q_den"))
    }
    cum.select((groupCols.map(col) :+ col("bin") :+ col("_cum") :+
        col("_n") :+ explode(array(quants: _*)).as("_q")): _*)
      .withColumn("target",
        expr("(_n * _q.q_num + _q.q_den - 1) div _q.q_den"))
      .where(col("_cum") >= col("target"))
      .groupBy(groupCols.map(col) :+ col("_q.q_num").as("q_num") :+
        col("_q.q_den").as("q_den") :+ col("target"): _*)
      .agg(min(col("bin")).as("bin"))
      .withColumn("lo", logBinLo(col("bin"), subBits))
      .withColumn("hi", logBinHi(col("bin"), subBits))
  }

  // ------------------------------------------------------------------
  // Bloom filter (Bloom 1970): fixed-size (2^mBits bits) MEMBERSHIP
  // pre-filters — "might this key be in the set" with no false
  // negatives and a tunable false-positive rate. The join-pushdown
  // workhorse at 100 TB: build the filter over the SMALL side's join
  // keys (one bounded aggregation), broadcast the ≤ 2^mBits/8-byte
  // word array, and drop non-matching rows from the BIG side map-side
  // BEFORE the shuffle join — a hand-rolled semi-join pushdown that
  // costs one broadcast instead of a full shuffle of the big side.
  //
  // Bit positions come from the same engine-portable splitmix64 chain
  // as every other sketch (position_i = splitmix64(hash + seed + i) &
  // (m−1), low bits two's-complement portable — the cmSketch rule),
  // so the whole bitmap — and every membership verdict — is
  // deterministic, layout-invariant, and replayable bit-for-bit by an
  // external SQL engine. Filters with the same (nHashes, mBits, seed)
  // merge by word-wise OR (set union).
  // ------------------------------------------------------------------

  /** The nHashes bit positions of one already-hashed key (int in
    * [0, 2^mBits)). `hash` should be a well-mixed long ([[keyHash]]
    * for strings, [[splitmix64_rank]] for numeric ids). */
  def bloomPositions(hash: Column, nHashes: Int, mBits: Int): Column = {
    require(mBits >= 6 && mBits <= 30, s"mBits must be in [6, 30], got $mBits")
    require(nHashes >= 1 && nHashes <= 16, s"nHashes in [1, 16], got $nHashes")
    val mask = (1L << mBits) - 1L
    array((0 until nHashes).map { i =>
      splitmix64_rank(hash, i.toLong).bitwiseAND(lit(mask)).cast("int")
    }: _*)
  }

  /** Sparse build: the DISTINCT set bit positions of all keys — ≤ 2^mBits
    * rows. ONE distinct-key pre-aggregation (the corpus collapses to its
    * key vocabulary before hashing — the cmSketch shape), then a bounded
    * explode of nHashes positions per distinct key. */
  def bloomBuild(df: DataFrame, hash: Column, nHashes: Int,
      mBits: Int): DataFrame =
    df.select(hash.as("_h")).where(col("_h").isNotNull).distinct()
      .select(explode(bloomPositions(col("_h"), nHashes, mBits)).as("pos"))
      .distinct()

  /** Dense packed artifact: ONE row with `words` = the 2^mBits-bit
    * bitmap as 2^mBits/64 longs (word w bit b set ⇔ position w·64+b
    * set). bit_or over distinct single-bit values per word — absent
    * words ride in via the static word index table. The broadcastable /
    * storable / OR-mergeable form. */
  def bloomPack(positions: DataFrame, mBits: Int): DataFrame = {
    val nWords = 1 << (mBits - 6)
    val spark = positions.sparkSession
    val idx = spark.range(0, nWords).select(col("id").cast("int").as("widx"))
    val words = positions
      .select(shiftright(col("pos"), 6).as("widx"),
        shl1(col("pos").bitwiseAND(lit(63)).cast("int")).as("_bit"))
      .groupBy("widx").agg(bit_or(col("_bit")).as("word"))
    idx.join(words, Seq("widx"), "left")
      .select(col("widx"), coalesce(col("word"), lit(0L)).as("word"))
      // sort-then-project, NOT an aggregate/concat fold: building the
      // array by repeated concat is O(n²) in the word count (measured
      // minutes at 2^18 words); transform over the sorted structs is
      // one linear pass
      .agg(transform(
        array_sort(collect_list(struct(col("widx"), col("word")))),
        s => s.getField("word")).as("words"))
  }

  /** Membership test column over a packed words array: true iff ALL
    * nHashes bit positions of `hash` are set. Map-only — element_at on
    * the (broadcast) words array + an unrolled AND of nHashes bit
    * tests; zero shuffle, zero explode, stays in codegen. */
  def bloomMightContain(hash: Column, words: Column, nHashes: Int,
      mBits: Int): Column = {
    val mask = (1L << mBits) - 1L
    (0 until nHashes).map { i =>
      val pos = splitmix64_rank(hash, i.toLong).bitwiseAND(lit(mask)).cast("int")
      val word = element_at(words, shiftright(pos, 6) + 1)
      shru(word, pos.bitwiseAND(lit(63))).bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
  }

  /** Membership test against a DRIVER-HELD word array embedded as one
    * plan literal — the scan-side form: `element_at` on a literal is a
    * constant lookup inside whole-stage codegen, and the array ships
    * ONCE per task. (Testing against a words COLUMN via crossJoin is a
    * trap at scale: the join materializes the multi-MB array into
    * every output UnsafeRow — measured 959 s vs ~10 s on 20M rows.) */
  def bloomMightContainLit(hash: Column, words: Seq[Long], nHashes: Int,
      mBits: Int): Column =
    bloomMightContain(hash, typedLit(words), nHashes, mBits)

  /** The 100 TB shape end-to-end: keep only `big` rows whose `hash`
    * might be in the filter built from `small`'s hashes. The packed
    * bitmap (≤ 2^mBits/8 bytes — BOUNDED by construction, the
    * broadcast-query-rows precedent) is collected once and embedded as
    * a literal, so the big side sees a map-only codegen filter with NO
    * join. No false negatives: every row whose key IS present survives. */
  def bloomPrefilter(big: DataFrame, bigHash: Column, small: DataFrame,
      smallHash: Column, nHashes: Int, mBits: Int): DataFrame = {
    val words = bloomPack(bloomBuild(small, smallHash, nHashes, mBits), mBits)
      .head.getSeq[Long](0)
    big.where(bloomMightContainLit(bigHash, words, nHashes, mBits))
  }

  /** Merge packed filters with identical (nHashes, mBits, seed): word-
    * wise OR (set union) — per-shard/per-day artifacts combine without
    * re-reading data. */
  def bloomMerge(packed: DataFrame): DataFrame =
    packed.agg(aggregate(collect_list(col("words")),
      typedLit(Seq.empty[Long]),
      (acc, ws) => when(size(acc) === 0, ws)
        .otherwise(zip_with(acc, ws, (a, b) => a.bitwiseOR(b)))).as("words"))

  /** Exact heavy hitters — every key with count·k > N — without a
    * full-vocabulary shuffle (Misra & Gries 1982 summaries + the
    * candidates-then-verify second pass). Pass 1 runs a Misra–Gries
    * summary of `k·candidateFactor` counters INSIDE each partition
    * (mapPartitions — genuine per-partition imperative state, the rare
    * legitimate case) and emits only the surviving candidate keys: any
    * key with global count > N/k has count > N_p/k on at least one
    * partition and therefore survives that partition's summary, so the
    * union of survivors is a guaranteed superset of the true heavy
    * hitters. Pass 2 broadcast-joins the stream against the bounded
    * (≤ parts·k·candidateFactor distinct) candidate set and takes ONE
    * exact count aggregation over it, so the verify shuffle carries only
    * candidate keys, never the vocabulary. The final output — exact
    * counts, exact integer threshold cnt·k > N — is unique and
    * layout-invariant even though MG survivor sets are order-dependent.
    *
    * Reference analogue: the frequent-terms slice of corpus summaries
    * (array/mixins/plot.py vocabulary views); here it is the 100 TB
    * path for "which boilerplate tokens dominate the crawl". */
  def heavyHitters(df: DataFrame, key: Column, k: Int,
      candidateFactor: Int = 4): DataFrame = {
    require(k > 0 && candidateFactor > 0, "k and candidateFactor must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(key.cast("string").as("key"))
      .where(col("key").isNotNull)
    val cap = k * candidateFactor
    val cands = keyed.as[String].mapPartitions { it =>
      val counts = new scala.collection.mutable.HashMap[String, Long]()
      it.foreach { s =>
        if (counts.contains(s)) counts.update(s, counts(s) + 1L)
        else if (counts.size < cap) counts.update(s, 1L)
        else { // decrement-all step: pairs with cap arrivals, amortized O(1)
          counts.mapValuesInPlace((_, v) => v - 1L)
          counts.filterInPlace((_, v) => v > 0L)
        }
      }
      counts.keysIterator
    }.toDF("key").distinct()
    val totals = keyed.agg(count(lit(1)).as("n_total"))
    keyed.join(broadcast(cands), Seq("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(totals))
      .where(col("cnt") * k > col("n_total"))
  }
}
