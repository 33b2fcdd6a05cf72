package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Checkpoints.LineageCutOps

import graft.functions.fnv64

/** Probabilistic latent semantic analysis (Hofmann 1999) — soft topic
  * mixtures over a bag-of-words corpus — as a deterministic FIXED-POINT
  * EM: every probability is a ppm long (floor-divided integer), every
  * aggregation an exact integer sum, so the fit is layout-invariant,
  * bit-reproducible, and replayable step-for-step in an external SQL
  * engine. The LLM-pipeline use: topic-balanced source mixing and
  * corpus-diversity audits, where "the mixture" must be a stable,
  * auditable artifact rather than a seed-dependent float fit.
  *
  * Arithmetic contract (mirrored exactly by the q178/q179 oracles):
  *  - init: θ⁰_dz = 1e6 div K uniform; φ⁰ raw_zw = 1e6 +
  *    pmod(fnv64(w) + z·2654435761, 1e6) (the engine-portable FNV-1a
  *    space gated by q46/q105 — symmetry breaking with no RNG), then
  *    per-topic normalized raw·1e6 div Σ_w raw.
  *  - E-step per (d,w): num_z = θ_dz·φ_zw (≤ 1e12), r_z = num_z·1e6
  *    div Σ_z num_z (uniform 1e6 div K when the mass is all-zero).
  *  - M-step: θ'_dz ∝ Σ_w c_dw·r_z, φ'_zw ∝ Σ_d c_dw·r_z — Decimal(38,0)
  *    sums (order-free), one floor division per cell to renormalize.
  *
  * Scale shape: per iteration the E-step is tok ⋈ θ (doc-keyed) ⋈ φ
  * (word-keyed, broadcast-sized for any capped vocabulary) with the
  * responsibility array computed IN-ROW (no (d,w) shuffle for the
  * denominator), then two partially-aggregated groupBys (T·K rows
  * collapse map-side to |D|·K and K·|V|) and bounded-K normalizations
  * (a per-doc window over K rows; a K-row broadcast join per topic).
  * No global windows, no driver-side math, no collect.
  *
  * Quantization bound: φ lives on a 1e6 grid, so per-topic mass is
  * meaningful for vocabularies up to ~10^5–10^6 distinct tokens — cap
  * the vocabulary upstream (`GroupOps.vocabulary(minFreq)`), as every
  * practical topic model does.
  *
  * Reference analogue: none (the reference has no topic model); this is
  * the natural extension of its split_by_tag/source-mixing surface to
  * latent groups, built Spark-first.
  */
object Plsa {

  /** Exploded, gateable model tables:
    * theta(d, z, t): per-doc topic mixture, ppm longs;
    * phi(z, w, p): per-topic word distribution, ppm longs. */
  case class Model(theta: DataFrame, phi: DataFrame, k: Int)

  /** Fit by `iters` full EM rounds over `tokens(docCol, wordCol,
    * cntCol)` — exact integer (doc, word) counts, e.g. from a
    * tokenize→groupBy. */
  def fit(tokens: DataFrame, docCol: String, wordCol: String,
      cntCol: String, k: Int, iters: Int = 2): Model = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val tok = tokens.select(col(docCol).as("d"), col(wordCol).as("w"),
      col(cntCol).cast("long").as("c"))
    val words = tok.select("w").distinct()
    val docs = tok.select("d").distinct()

    // φ⁰: FNV-perturbed raw weights in [1e6, 2e6) — strictly positive,
    // engine-portable, no RNG — normalized per topic.
    val f0 = words.select(col("w"),
      posexplode(transform(sequence(lit(0), lit(k - 1)),
        z => lit(1000000L) +
          pmod(fnv64(col("w")) + z.cast("long") * lit(2654435761L),
            lit(1000000L)))).as(Seq("z", "_raw")))
    val z0 = f0.groupBy("z").agg(sum("_raw").as("_tot"))
    val ph0 = f0.join(broadcast(z0), Seq("z"))
      .select(col("z"), col("w"), expr("(_raw * 1000000) div _tot").as("p"))

    var phi = pack(ph0, "w", "z", "p", "ph")
    var theta = docs.withColumn("th", array_repeat(lit(1000000L / k), k))

    for (_ <- 0 until iters) {
      val ex = eStep(tok, theta, phi, k)
      // M-step φ': per-topic word mass, K-row broadcast normalizer
      val phRaw = ex.groupBy("z", "w").agg(sum("_cr").as("_s"))
      val zTot = phRaw.groupBy("z").agg(sum("_s").as("_tot"))
      val ph = phRaw.join(broadcast(zTot), Seq("z"))
        .select(col("z"), col("w"),
          expr("CAST((_s * 1000000) div _tot AS BIGINT)").as("p"))

      theta = pack(thetaFromEx(ex), "d", "z", "t", "th").cutLineage(false)
      phi = pack(ph, "w", "z", "p", "ph").cutLineage(false)
    }

    Model(unpack(theta, "d", "th", "z", "t"),
      unpack(phi, "w", "ph", "z", "p"), k)
  }

  /** Fold-in (Hofmann's heuristic for unseen documents): topic mixtures
    * for NEW docs against a FROZEN φ — θ-only EM rounds, uniform init.
    * The deployment path: fit φ once on a bounded sample, then tag a
    * corpus of any size (or stream micro-batches) — per round one
    * doc-keyed join + the broadcast-sized φ join + one (d,z) groupBy;
    * the vocabulary tables never update. Docs with no in-vocabulary
    * words carry no evidence and are absent from the output. `phi` is
    * the exploded (z, w, p) table of a fitted [[Model]]. */
  def foldIn(tokens: DataFrame, docCol: String, wordCol: String,
      cntCol: String, phi: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val k = phi.agg(max("z")).head().getInt(0) + 1 // 1-row metadata read
    val phiArr = pack(phi, "w", "z", "p", "ph")
    val tok = tokens.select(col(docCol).as("d"), col(wordCol).as("w"),
      col(cntCol).cast("long").as("c"))
    var theta = tok.select("d").distinct()
      .withColumn("th", array_repeat(lit(1000000L / k), k))
    for (_ <- 0 until iters) {
      theta = pack(thetaFromEx(eStep(tok, theta, phiArr, k)),
        "d", "z", "t", "th").cutLineage(false)
    }
    unpack(theta, "d", "th", "z", "t")
  }

  /** E-step: responsibilities computed in-row after the doc-keyed θ and
    * word-keyed φ joins, then one narrow explode. Checkpointed because
    * (in [[fit]]) both M-step branches read this T·K-row table. */
  private def eStep(tok: DataFrame, theta: DataFrame, phi: DataFrame,
      k: Int): DataFrame =
    tok
      .join(theta, Seq("d"))
      .join(phi, Seq("w"))
      .withColumn("_num", zip_with(col("th"), col("ph"), (a, b) => a * b))
      .withColumn("_den",
        aggregate(col("_num"), lit(0L), (acc, x) => acc + x))
      .select(col("d"), col("w"), col("c"), col("_den"),
        posexplode(col("_num")).as(Seq("z", "_nz")))
      .withColumn("_r", when(col("_den") > 0,
          expr("_nz * 1000000 div _den"))
        .otherwise(lit(1000000L / k)))
      .withColumn("_cr", (col("_r") * col("c")).cast("decimal(38,0)"))
      .cutLineage(false)

  /** M-step θ': per-doc topic mass, normalized over the K rows. */
  private def thetaFromEx(ex: DataFrame): DataFrame =
    ex.groupBy("d", "z").agg(sum("_cr").as("_s"))
      .withColumn("_tot", sum("_s").over(Window.partitionBy("d")))
      .select(col("d"), col("z"),
        expr("CAST((_s * 1000000) div _tot AS BIGINT)").as("t"))

  /** Hard topic per doc: argmax_z θ_dz, smallest z on ties (the q112
    * min-struct argmax rule — replayable as an ORDER BY t DESC, z). */
  def docTopics(theta: DataFrame): DataFrame =
    theta.groupBy("d")
      .agg(min(struct((-col("t")).as("_nt"), col("z").as("_z"))).as("_m"))
      .select(col("d"), col("_m._z").as("topic"),
        (-col("_m._nt")).as("t"))

  private def pack(df: DataFrame, key: String, idx: String, v: String,
      out: String): DataFrame =
    df.groupBy(key)
      .agg(transform(sort_array(collect_list(struct(col(idx), col(v)))),
        s => s.getField(v)).as(out))

  private def unpack(df: DataFrame, key: String, arr: String, idx: String,
      v: String): DataFrame =
    df.select(col(key), posexplode(col(arr)).as(Seq(idx, v)))
}
