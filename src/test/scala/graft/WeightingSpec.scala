package graft

import org.apache.spark.sql.functions._

import graft.operators.GroupOps

/** r7 additions, twelfth wave: importance-weight diagnostics (Kish
  * ESS), survey raking (IPF), and quantile treatment effects —
  * textbook identities, convergence, guards. */
class WeightingSpec extends SparkSuite {
  import spark.implicits._

  // ---- quantileTreatmentEffect ---------------------------------------

  test("qte: exact per-arm order statistics, tail-only effect visible") {
    // control 1..10; treated 1..9 with the top value at 100:
    // median (k = ceil(0.5*10) = 5) both 5 -> qte 0; the max
    // (q = 1e6, k = 10): treated 100 vs control 10 -> qte 90.
    val rows = (1L to 10L).map(v => (false, v)) ++
      ((1L to 9L).map(v => (true, v)) :+ (true, 100L))
    val out = graft.operators.Evaluate.quantileTreatmentEffect(
        rows.toDF("t", "y"), col("t"), col("y"),
        qPpms = Seq(500000L, 1000000L))
      .orderBy("q_ppm").collect()
    assert(out(0).getAs[Long]("qte") == 0L)
    assert(out(1).getAs[Long]("y_t") == 100L &&
      out(1).getAs[Long]("y_c") == 10L)
    assert(out(1).getAs[Long]("qte") == 90L)
  }

  test("qte: empty arm -> null side; q=1e6 is the max") {
    val rows = Seq((false, 3L), (false, 7L))
    val out = graft.operators.Evaluate.quantileTreatmentEffect(
        rows.toDF("t", "y"), col("t"), col("y"), qPpms = Seq(1000000L))
      .collect().head
    assert(out.getAs[Long]("y_c") == 7L)
    assert(out.isNullAt(out.fieldIndex("y_t")))
    assert(out.isNullAt(out.fieldIndex("qte")))
  }

  // ---- essWeights -----------------------------------------------------

  test("ess: equal weights -> ESS = n; one whale -> ESS ~ 1") {
    val eq = Seq.fill(100)(5L).toDF("w")
    val r = GroupOps.essWeights(eq, col("w")).collect().head
    assert(math.abs(r.getAs[Double]("ess") - 100.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("ess_ratio") - 1.0) < 1e-9)
    val whale = (Seq.fill(99)(1L) :+ 1000000L).toDF("w")
    val r2 = GroupOps.essWeights(whale, col("w")).collect().head
    assert(r2.getAs[Double]("ess") < 1.1)
  }

  test("ess: textbook hand value; negative weight refuses") {
    // w = (1, 2, 3): ESS = 36/14
    val r = GroupOps.essWeights(Seq(1L, 2L, 3L).toDF("w"), col("w"))
      .collect().head
    assert(math.abs(r.getAs[Double]("ess") - 36.0 / 14) < 1e-12)
    intercept[Exception] {
      GroupOps.essWeights(Seq(-1L).toDF("w"), col("w")).collect()
    }
  }

  // ---- ipfWeights -----------------------------------------------------

  test("ipf: margins converge toward targets; already-fit grid is fixed") {
    // 2x2 counts (10, 30 / 30, 30): rake to uniform rows, uniform cols.
    val cells = Seq(("a", "x", 10L), ("a", "y", 30L),
      ("b", "x", 30L), ("b", "y", 30L)).toDF("r", "c", "n")
    val rt = Seq(("a", 500000L), ("b", 500000L)).toDF("r", "t_ppm")
    val ct = Seq(("x", 500000L), ("y", 500000L)).toDF("c", "t_ppm")
    val out = GroupOps.ipfWeights(cells, rt, ct, iters = 4).collect()
      .map(r => (r.getAs[String]("r"), r.getAs[String]("c")) ->
        r.getAs[Long]("w_ppm")).toMap
    // achieved margins within ppm slop of uniform
    val mass = Seq(("a","x",10L),("a","y",30L),("b","x",30L),("b","y",30L))
      .map { case (r, c, n) => (r, c, n * out((r, c)).toDouble) }
    val rowA = mass.filter(_._1 == "a").map(_._3).sum
    val rowB = mass.filter(_._1 == "b").map(_._3).sum
    assert(math.abs(rowA / (rowA + rowB) - 0.5) < 1e-3)
    val colX = mass.filter(_._2 == "x").map(_._3).sum
    val colY = mass.filter(_._2 == "y").map(_._3).sum
    assert(math.abs(colX / (colX + colY) - 0.5) < 1e-3)
    // a grid already at target keeps w = 1e6 (identity scaling)
    val fit = Seq(("a", "x", 25L), ("a", "y", 25L),
      ("b", "x", 25L), ("b", "y", 25L)).toDF("r", "c", "n")
    val idw = GroupOps.ipfWeights(fit, rt, ct, iters = 2).collect()
    assert(idw.forall(_.getAs[Long]("w_ppm") == 1000000L))
  }

  test("ipf: zero target zeroes the margin; empty margin with target refuses") {
    val cells = Seq(("a", "x", 10L), ("b", "x", 10L)).toDF("r", "c", "n")
    val rt = Seq(("a", 1000000L), ("b", 0L)).toDF("r", "t_ppm")
    val ct = Seq(("x", 1000000L)).toDF("c", "t_ppm")
    val out = GroupOps.ipfWeights(cells, rt, ct, iters = 1).collect()
      .map(r => r.getAs[String]("r") -> r.getAs[Long]("w_ppm")).toMap
    assert(out("b") == 0L && out("a") > 0L)
    // layout invariance
    val two = GroupOps.ipfWeights(cells.repartition(5), rt, ct, 1)
      .collect().map(r => r.getAs[String]("r") -> r.getAs[Long]("w_ppm"))
      .toMap
    assert(two == out)
  }
}
