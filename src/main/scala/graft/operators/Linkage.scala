package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter, JASA 1969) — the
  * entity-resolution tier of corpus curation: "are these two records
  * the same real-world thing" across sources that share no key
  * (author pages, licensing registries, crawl duplicates with edited
  * metadata). [[Dedup.fellegiSunter]] SCORES an already-built pair
  * table under caller-supplied (m, u); this object supplies the
  * layers upstream of it — blocked candidate GENERATION with the
  * hot-block valve, data-driven u ESTIMATION, and the agreement-
  * pattern rollup an F-S EM fits on — using the same ln-ppb weight
  * quantization ([[Dedup.fsWeightsPpb]]) so the two compose.
  *
  * The F-S decision variable for a candidate pair is the sum of
  * per-field log-likelihood ratios: agreement on field f contributes
  * ln(m_f/u_f), disagreement ln((1−m_f)/(1−u_f)), where m_f =
  * P(agree | match) (supplied — domain knowledge or EM) and u_f =
  * P(agree | non-match), estimated here exactly from the data as the
  * collision probability of two random records:
  *
  *   u_f = Σ_v nL_v · nR_v / (|L| · |R|)
  *
  * (nL_v/nR_v = per-value frequencies). All u sufficient statistics
  * are exact integers; each field's two log weights are the one float
  * op, quantized ONCE to ppb longs at plan time, then summed exactly.
  *
  * Scale shape: candidate generation is a BLOCKED equi-join on the
  * caller's blocking key (never a cross join), with the standard
  * hot-block valve; u-estimation is one groupBy per field over value
  * frequencies joined left×right per value — O(distinct values)
  * rows, never O(pairs). Agreement patterns bit-pack into a long
  * (field i = bit i), so the full pattern table — what F-S EM
  * actually fits on — aggregates map-side.
  */
object Linkage {

  /** Blocked + valved sides with normalized column names: left gets
    * (_blk, _lid?, _lf0..), right (_blk, _rid?, _rf0..). Blocks larger
    * than `maxBlock` on either side are dropped (the
    * [[Dedup.gridPairs2d]] valve: completeness traded only on the
    * caller's explicit choice). */
  private def blockedSides(left: DataFrame, right: DataFrame,
      leftId: Option[String], rightId: Option[String],
      leftBlock: Column, rightBlock: Column,
      fields: Seq[(String, Column, Column)],
      maxBlock: Int): (DataFrame, DataFrame) = {
    require(fields.nonEmpty, "linkage needs >= 1 field")
    require(fields.size <= 62, s"at most 62 fields, got ${fields.size}")
    val lCols = leftBlock.as("_blk") +:
      (leftId.map(c => col(c).as("_lid")).toSeq ++
        fields.zipWithIndex.map { case ((_, le, _), i) =>
          le.cast("string").as(s"_lf$i") })
    val rCols = rightBlock.as("_blk") +:
      (rightId.map(c => col(c).as("_rid")).toSeq ++
        fields.zipWithIndex.map { case ((_, _, re), i) =>
          re.cast("string").as(s"_rf$i") })
    val l = left.select(lCols: _*).where(col("_blk").isNotNull)
    val r = right.select(rCols: _*).where(col("_blk").isNotNull)
    if (maxBlock == Int.MaxValue) (l, r)
    else {
      val hot = l.groupBy("_blk").agg(count(lit(1)).as("_nl"))
        .join(r.groupBy("_blk").agg(count(lit(1)).as("_nr")), Seq("_blk"),
          "full")
        .where(coalesce(col("_nl"), lit(0L)) > maxBlock ||
          coalesce(col("_nr"), lit(0L)) > maxBlock)
        .select("_blk")
      (l.join(broadcast(hot), Seq("_blk"), "left_anti"),
        r.join(broadcast(hot), Seq("_blk"), "left_anti"))
    }
  }

  /** Per-field agreement predicates over the normalized pair columns
    * (nulls never agree — an unverifiable field is a disagreeing
    * field, the [[Quality.expectRows]] rule). */
  private def agreements(nFields: Int): Seq[Column] =
    (0 until nFields).map(i =>
      col(s"_lf$i").isNotNull && col(s"_rf$i").isNotNull &&
        col(s"_lf$i") === col(s"_rf$i"))

  private def packPattern(agree: Seq[Column]): Column =
    agree.zipWithIndex.map { case (a, i) =>
      when(a, lit(1L << i)).otherwise(lit(0L)) }.reduce(_ + _)

  /** Candidate pairs from equality blocking with agreement pattern and
    * F-S weight. `fields` = (name, leftExpr, rightExpr) compared by
    * exact equality (normalize upstream); `mPpm(f)` = m-probability of
    * field f in ppm; u-probabilities are estimated exactly from the
    * value-frequency collision mass (clamped into (0,1) so a
    * never-colliding field keeps a finite disagreement weight). Weights
    * are [[Dedup.fsWeightsPpb]] ln-ppb longs, quantized once per field
    * at plan time, summed exactly.
    * Returns (left_id, right_id, pattern, n_agree, weight_ppb) —
    * every column an exact integer. */
  def scorePairs(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      leftBlock: Column, rightBlock: Column,
      fields: Seq[(String, Column, Column)],
      mPpm: Seq[Long],
      maxBlock: Int = Int.MaxValue): DataFrame = {
    require(mPpm.size == fields.size,
      s"mPpm size ${mPpm.size} != fields size ${fields.size}")
    mPpm.foreach(m => require(m > 0L && m < 1000000L,
      s"mPpm must be in (0, 1e6), got $m"))
    val (lv, rv) = blockedSides(left, right, Some(leftId), Some(rightId),
      leftBlock, rightBlock, fields, maxBlock)

    val nL = lv.count()
    val nR = rv.count()
    require(nL > 0L && nR > 0L, "scorePairs: empty side after blocking")
    val uProb: Seq[Double] = fields.indices.map { i =>
      val fl = lv.groupBy(col(s"_lf$i").as("_v"))
        .agg(count(lit(1)).as("_cl")).where(col("_v").isNotNull)
      val fr = rv.groupBy(col(s"_rf$i").as("_v"))
        .agg(count(lit(1)).as("_cr")).where(col("_v").isNotNull)
      val num = fl.join(fr, "_v")
        .agg(coalesce(sum(col("_cl").cast("decimal(38,0)") * col("_cr")),
          lit(0).cast("decimal(38,0)")).as("_u"))
        .head.getDecimal(0)
      val u = num.doubleValue() / (nL.toDouble * nR.toDouble)
      math.min(math.max(u, 1e-12), 1.0 - 1e-12)
    }

    val agree = agreements(fields.size)
    val nAgree = agree.map(a => when(a, lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    val weight = agree.zipWithIndex.map { case (a, i) =>
      val (wa, wd) = Dedup.fsWeightsPpb(mPpm(i).toDouble / 1e6, uProb(i))
      when(a, lit(wa)).otherwise(lit(wd))
    }.reduce(_ + _)

    lv.join(rv, Seq("_blk"))
      .select(col("_lid").as("left_id"), col("_rid").as("right_id"),
        packPattern(agree).as("pattern"), nAgree.as("n_agree"),
        weight.as("weight_ppb"))
  }

  /** The F-S sufficient statistics: blocked candidate pairs rolled up
    * by agreement pattern — the table the EM step of a full F-S fit
    * iterates on, and the exact-integer gate for the whole pipeline.
    * Same blocking/valve contract as [[scorePairs]]; no ids needed,
    * the pattern rollup aggregates map-side before any shuffle of
    * pair-shaped data leaves the block join. Returns
    * (pattern, n_pairs), pattern bit-packed in field order. */
  def patternCounts(left: DataFrame, right: DataFrame,
      leftBlock: Column, rightBlock: Column,
      fields: Seq[(String, Column, Column)],
      maxBlock: Int = Int.MaxValue): DataFrame = {
    val (lv, rv) = blockedSides(left, right, None, None,
      leftBlock, rightBlock, fields, maxBlock)
    lv.join(rv, Seq("_blk"))
      .select(packPattern(agreements(fields.size)).as("pattern"))
      .groupBy("pattern").agg(count(lit(1)).as("n_pairs"))
  }

  /** Fitted F-S parameters: match prevalence `p`, per-field m/u. */
  final case class EmFit(p: Double, m: IndexedSeq[Double],
      u: IndexedSeq[Double])

  /** The classic Fellegi-Sunter EM (Winkler 1988) over a
    * [[patternCounts]] rollup — fits (p, m_f, u_f) from the agreement
    * patterns alone under the standard conditional-independence model,
    * no labels needed. Driver-side by design: the pattern table has at
    * most 2^nFields rows (loudly required ≤ 2^20), i.e. the expensive
    * distributed work — the blocked pair join — already happened in
    * patternCounts; iterating a ≤million-row table on the driver is the
    * correct altitude (the [[Unigram]] guarded-fit rule). Deterministic:
    * fixed iteration count, fixed init, no RNG. Identifiability needs
    * nFields ≥ 3 (2³−1 = 7 free pattern dims ≥ the 7 parameters — the
    * classic F-S condition; with 2 fields EM converges but the solution
    * is not unique). Feed the fitted m/u to [[Dedup.fellegiSunter]] /
    * [[scorePairs]] for the decision pass. */
  def emFit(patterns: DataFrame, nFields: Int, iters: Int = 20,
      init: EmFit = null): EmFit = {
    require(nFields >= 1 && nFields <= 20,
      s"emFit supports 1..20 fields, got $nFields")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val rows = patterns.select(col("pattern").cast("long"),
        col("n_pairs").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(rows.nonEmpty, "emFit: empty pattern table")
    require(rows.length <= (1 << nFields),
      s"more patterns (${rows.length}) than 2^$nFields")
    val total = rows.map(_._2).sum.toDouble
    var fit = Option(init).getOrElse(
      EmFit(0.1, IndexedSeq.fill(nFields)(0.9),
        IndexedSeq.fill(nFields)(0.1)))
    def clamp(x: Double) = math.min(math.max(x, 1e-9), 1.0 - 1e-9)
    for (_ <- 0 until iters) {
      // E: P(match | pattern) per pattern under conditional independence
      val g = rows.map { case (pat, n) =>
        var pm = fit.p; var pu = 1.0 - fit.p
        var f = 0
        while (f < nFields) {
          val agree = ((pat >> f) & 1L) == 1L
          pm *= (if (agree) fit.m(f) else 1.0 - fit.m(f))
          pu *= (if (agree) fit.u(f) else 1.0 - fit.u(f))
          f += 1
        }
        (pat, n, pm / (pm + pu))
      }
      // M: reweighted prevalence and per-field agreement rates
      val wMatch = g.map { case (_, n, w) => n * w }.sum
      val m = (0 until nFields).map { f =>
        clamp(g.collect { case (pat, n, w) if ((pat >> f) & 1L) == 1L =>
          n * w }.sum / math.max(wMatch, 1e-300))
      }
      val u = (0 until nFields).map { f =>
        clamp(g.collect { case (pat, n, w) if ((pat >> f) & 1L) == 1L =>
          n * (1.0 - w) }.sum / math.max(total - wMatch, 1e-300))
      }
      fit = EmFit(clamp(wMatch / total), m, u)
    }
    fit
  }
}
