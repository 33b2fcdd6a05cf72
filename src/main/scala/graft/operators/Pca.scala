package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{co_moments, project_vector}

/** Exact distributed PCA over an embedding column — the dimensionality
  * reduction step in front of semantic dedup / clustering pipelines
  * (SemDeDup, Abbas et al. 2023, PCA-reduces embeddings before clustering;
  * same role as the reference's dataclass tensor post-processing hooks).
  *
  * Architecture (the k-means-centroid pattern):
  *   1. ONE distributed scan computes exact integer co-moments (row count,
  *      per-dim sums, upper-triangle pairwise product sums) over the
  *      q74-quantized vectors via [[graft.functions.CoMomentAgg]] — map-side
  *      partial aggregation collapses each partition to d(d+1)/2 + d longs,
  *      so the shuffle is O(partitions × d²) bytes regardless of N.
  *   2. The d×d covariance (tiny) is eigendecomposed ON THE DRIVER with a
  *      deterministic cyclic Jacobi sweep — no RNG, no pivot search, fixed
  *      rotation order — so the fit is reproducible bit-for-bit.
  *   3. The transform is ONE map-only codegen kernel
  *      ([[graft.functions.ProjectVector]]): loadings are broadcast as
  *      literals, no join, no shuffle — the 100 TB-shaped projection.
  *
  * Because step 1 is integer-exact and summation-order-free, the whole fit
  * is layout-invariant: repartitioning the input cannot change a single bit
  * of the loadings.
  */
object Pca {

  /** The engine-portable quantizer (identical to q74's randomProjection
    * input): round(v · quant) as BIGINT, replayable in an external SQL
    * engine as `CAST(round(CAST(v AS DOUBLE) * quant) AS BIGINT)`. */
  def quantize(vec: Column, quant: Double = 10000.0): Column =
    transform(vec, x => round(x.cast("double") * quant).cast("long"))

  /** Upper-triangle exact co-moments of the first `dims` dimensions, as a
    * DataFrame of (i, j, n, sxi, sxj, sxy) — i ≤ j, all BIGINT, exact.
    * Rows with fewer than `dims` dimensions are skipped (not counted).
    * This is the distributed stage of [[fit]], exposed for oracle gating:
    * the numerator of cov(i,j) is n·sxy − sxi·sxj over these sums. */
  def comoments(df: DataFrame, vecCol: String, dims: Int,
      quant: Double = 10000.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = slice(quantize(col(vecCol), quant), 1, dims)
    val agg = df.select(co_moments(q, dims).as("s"))
      .select(col("s.n").as("n"), col("s.sx").as("sx"), col("s.sxy").as("sxy"))
    val idx = (for { i <- 0 until dims; j <- i until dims }
      yield (i, j, i * dims - i * (i + 1) / 2 + j)).toDF("i", "j", "t")
    idx.crossJoin(broadcast(agg)).select(
      col("i"), col("j"), col("n"),
      element_at(col("sx"), col("i") + 1).as("sxi"),
      element_at(col("sx"), col("j") + 1).as("sxj"),
      element_at(col("sxy"), col("t") + 1).as("sxy"))
  }

  /** Exact correlation matrix over named scalar signals — the feature-
    * audit table a curation pipeline runs before trusting a quality
    * score ("does my classifier just measure document length?"). Each
    * row's signals are packed into one vector and pushed through the
    * same one-pass quantized [[comoments]] aggregate as PCA fit; rows
    * where ANY signal is null are skipped whole (the co_moments corrupt-
    * row rule), so every pair is computed over the same support.
    *
    * `cov_num = n·sxy − sxi·sxj` and the variance numerators are exact
    * integers on the 1/quant grid; Pearson r is ONE float chain over
    * them (`cov_num / sqrt(var_i · var_j)`), round-6.
    *
    * Output: (`sig_i`, `sig_j`, `n`, `cov_num`, `corr_r`), upper
    * triangle including the diagonal (diagonal corr 1 when var > 0).
    * One shuffle of a k(k+1)/2-long buffer — no per-pair jobs. */
  def correlationPairs(df: DataFrame, signals: Seq[(String, Column)],
      quant: Double = 10000.0): DataFrame = {
    require(signals.nonEmpty, "need at least one signal")
    val vec = array(signals.map(_._2.cast("double")): _*)
    val com = comoments(df.select(vec.as("_sig")), "_sig",
      signals.length, quant)
    val cov = com.withColumn("cov_num",
      (col("n") * col("sxy") - col("sxi") * col("sxj")).cast("long"))
    val diag = cov.where(col("i") === col("j"))
      .select(col("i").as("_k"), col("cov_num").as("_var"))
    val nameArr = array(signals.map(s => lit(s._1)): _*)
    cov
      .join(diag.withColumnRenamed("_k", "i").withColumnRenamed("_var", "_vi"), "i")
      .join(diag.withColumnRenamed("_k", "j").withColumnRenamed("_var", "_vj"), "j")
      .select(
        element_at(nameArr, col("i") + 1).as("sig_i"),
        element_at(nameArr, col("j") + 1).as("sig_j"),
        col("n"), col("cov_num"),
        when(col("_vi") > 0 && col("_vj") > 0,
          round(col("cov_num") /
            sqrt(col("_vi").cast("double") * col("_vj").cast("double")), 6))
          .as("corr_r"))
  }

  /** Fitted PCA basis. `mean` and `components` are in original (float)
    * units; `eigenvalues` are the covariance eigenvalues (variance units),
    * descending. `components(k)` is the kth principal axis (unit norm,
    * sign fixed so its largest-|coefficient| entry is positive). */
  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      totalVariance: Double) {

    def outDim: Int = components.length
    def dims: Int = mean.length

    def explainedVarianceRatio: Array[Double] =
      if (totalVariance <= 0) eigenvalues.map(_ => 0.0)
      else eigenvalues.map(_ / totalVariance)

    /** Map-only projection column: array<double> of length outDim. */
    def project(vec: Column): Column =
      project_vector(vec, mean.toSeq, components.map(_.toSeq).toSeq)
  }

  /** Fit a PCA basis with `outDim` components. One distributed co-moment
    * scan + a driver-side Jacobi eigensolve of the d×d covariance. `dims`
    * defaults to the length of the first non-empty vector. */
  def fit(df: DataFrame, vecCol: String, outDim: Int,
      quant: Double = 10000.0, dims: Int = -1): PcaModel = {
    val d =
      if (dims > 0) dims
      // deterministic 1-row metadata read (the sqTrain pattern): max over
      // all rows — an unordered head() would make the inferred dims (and
      // which rows the agg skips) depend on partition layout
      else df.agg(max(size(col(vecCol)))).head.getInt(0)
    require(outDim > 0 && outDim <= d, s"outDim must be in [1, $d], got $outDim")
    val q = slice(quantize(col(vecCol), quant), 1, d)
    val row = df.select(co_moments(q, d).as("s"))
      .select(col("s.n"), col("s.sx"), col("s.sxy")).head
    val n = row.getLong(0)
    val sx = row.getSeq[Long](1).toArray
    val sxy = row.getSeq[Long](2).toArray
    fitFromSums(n, sx, sxy, outDim, quant)
  }

  /** The driver-side half of [[fit]], callable on PERSISTED or STREAMED
    * co-moment sums (n, Σx, Σx·x upper triangle — e.g. the summed state
    * of `EventStream.streamingCoMoments`): co-moments are additive, so
    * a model fit from merged partial sums is bit-identical to a one-shot
    * fit over the union — incremental PCA without revisiting history. */
  def fitFromSums(n: Long, sx: Array[Long], sxy: Array[Long],
      outDim: Int, quant: Double = 10000.0): PcaModel = {
    val d = sx.length
    require(sxy.length == d * (d + 1) / 2,
      s"sxy length ${sxy.length} is not the upper triangle of d=$d")
    require(outDim > 0 && outDim <= d, s"outDim must be in [1, $d], got $outDim")
    require(n > 1, s"PCA needs at least 2 complete vectors, got $n")

    // covariance from exact integer sums: (n·sxy − sxi·sxj) / n² / quant²
    // (BigInt numerator — n·sxy can exceed 2^63 long before the sums do)
    val nD = n.toDouble
    val scale2 = quant * quant
    val cov = Array.ofDim[Double](d, d)
    var t = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val num = BigInt(n) * sxy(t) - BigInt(sx(i)) * sx(j)
        val c = num.toDouble / (nD * nD) / scale2
        cov(i)(j) = c
        cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }

    val (eigVals, eigVecs) = Jacobi.eigSym(cov)
    // order: eigenvalue descending, tie → lower original index (stable sort)
    val order = eigVals.indices.sortBy(k => (-eigVals(k), k)).take(outDim)
    val comps = order.map { k =>
      val v = Array.tabulate(d)(j => eigVecs(j)(k))
      // sign convention: largest-|coefficient| entry positive (tie → first)
      var j0 = 0
      var j = 1
      while (j < d) { if (math.abs(v(j)) > math.abs(v(j0))) j0 = j; j += 1 }
      if (v(j0) < 0) v.map(x => -x) else v
    }.toArray
    val mean = sx.map(_ / nD / quant)
    val total = (0 until d).map(k => cov(k)(k)).sum
    PcaModel(mean, comps, order.map(eigVals(_)).toArray, total)
  }

  /** fit + transform in one call: adds `outCol` = the projected
    * array<double>. */
  def fitTransform(df: DataFrame, vecCol: String, outDim: Int,
      outCol: String = "pca", quant: Double = 10000.0): (PcaModel, DataFrame) = {
    val m = fit(df, vecCol, outDim, quant)
    (m, df.withColumn(outCol, m.project(col(vecCol))))
  }
}

/** Deterministic cyclic Jacobi eigensolver for small symmetric matrices
  * (the driver-side step of [[Pca.fit]]; d is the embedding dimensionality,
  * ≤ a few thousand). Fixed sweep order (p ascending, q ascending), no
  * threshold pivoting, so the decomposition is reproducible across runs
  * and platforms with strictfp-free double math. */
object Jacobi {

  /** Returns (eigenvalues, eigenvectors-as-columns): a(j)(k) of the input
    * equals Σ_k vals(k)·vecs(·)(k) outer products. Input is not mutated. */
  def eigSym(a0: Array[Array[Double]], maxSweeps: Int = 64,
      tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val norm = math.sqrt(a0.map(r => r.map(x => x * x).sum).sum)
    val eps = if (norm == 0.0) tol else tol * norm
    var sweep = 0
    var off = offDiag(a)
    while (off > eps && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > eps / (d.toDouble * d)) {
            // classic Jacobi rotation annihilating a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val tVal = {
              val s = if (theta >= 0) 1.0 else -1.0
              s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(tVal * tVal + 1.0)
            val s = tVal * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(k => a(k)(k)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    val d = a.length
    var s = 0.0
    var i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
