package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector

import graft.functions.{feature_hash, TextFunctions}

/** Target-domain quality classifier — the GPT-3/CCNet pipeline trick:
  * train a cheap linear discriminator between a trusted target corpus
  * (positives) and the raw pool (negatives) over hashing-trick features,
  * then score every raw document with its "looks like the target"
  * probability and keep docs stochastically in proportion to it.
  *
  * The discriminative sibling of [[Dsir]] (which scores generative bag
  * models): same feature space ([[graft.functions.FeatureHash]]),
  * different decision rule.
  *
  * Scale shape: featurization is a codegen'd scalar expression riding
  * the scan; the fit is spark.ml LogisticRegression over those vectors
  * (distributed LBFGS — the model never exceeds `dim` doubles); scoring
  * is a pure Column (dot + sigmoid against the broadcast-literal
  * coefficients) — no UDFs, no shuffle, usable inside any projection.
  * The LBFGS gradient reduction is float-order dependent, so fitted
  * coefficients are NOT bit-reproducible across layouts (unlike every
  * gated operator here) — treat the model artifact, not the fit, as
  * the deterministic input downstream (q49 gates exactly that shape).
  */
object QualityClassifier {

  final case class Model(dim: Int, coefficients: Seq[Double],
      intercept: Double)

  /** Fit the discriminator: `target` rows are positives, `raw` rows
    * negatives, class-balanced by weight so a small target corpus still
    * steers the decision boundary. */
  def fit(raw: DataFrame, target: DataFrame, textCol: Column,
      dim: Int = 4096, maxIter: Int = 20,
      regParam: Double = 1e-4): Model = {
    val nRaw = raw.count().toDouble
    val nTgt = target.count().toDouble
    require(nRaw > 0 && nTgt > 0, "both corpora must be non-empty")
    def side(df: DataFrame, label: Double, weight: Double): DataFrame =
      df.select(
        array_to_vector(feature_hash(TextFunctions.tokens(textCol), dim))
          .as("features"),
        lit(label).as("label"), lit(weight).as("w"))
    val data = side(raw, 0.0, 1.0)
      .unionAll(side(target, 1.0, nRaw / nTgt))
    val m = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setWeightCol("w")
      .fit(data)
    Model(dim, m.coefficients.toArray.toSeq, m.intercept)
  }

  /** P(target | text) under a fitted model: sigmoid of the hashed-
    * feature dot product. Pure Column — rides the scan projection. */
  def score(textCol: Column, model: Model): Column = {
    val z = aggregate(
      zip_with(feature_hash(TextFunctions.tokens(textCol), model.dim),
        typedLit(model.coefficients), (x, w) => x * w),
      lit(0.0), (acc, x) => acc + x) + lit(model.intercept)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** The GPT-3 keep rule, determinized: keep each doc with probability
    * `score^alpha` via the engine-portable splitmix64 draw —
    * [[GroupOps.sampleWeighted]] on the classifier score, so the same
    * corpus + model always keeps the same rows. */
  def filterByScore(df: DataFrame, textCol: Column, model: Model,
      key: Column, alpha: Double = 1.0, seed: Long = 17L): DataFrame =
    GroupOps.sampleWeighted(df,
      pow(score(textCol, model), lit(alpha)), seed, key)
}
