package graft

import org.apache.spark.sql.functions._

import graft.operators.LangModel

/** Jensen–Shannon corpus drift: identical → 0, disjoint → ln 2, bounds,
  * and a hand-derived mixed case. */
class JsDivergenceSpec extends SparkSuite {
  import spark.implicits._

  private def js(rows: Seq[(String, String)]): Map[(String, String), Double] =
    LangModel.jsDivergencePairs(rows.toDF("source", "text"), "source",
        col("text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(7)).toMap

  test("identical distributions diverge by exactly 0") {
    val out = js(Seq(("a", "x y z x"), ("b", "x y z x")))
    assert(out(("a", "b")) === 0.0)
  }

  test("disjoint vocabularies diverge by ln 2") {
    val out = js(Seq(("a", "x y z"), ("b", "p q r")))
    assert(math.abs(out(("a", "b")) - math.log(2.0)) < 1e-9)
  }

  test("hand-derived partial overlap, symmetric in construction") {
    // a: x x y (p_x=2/3, p_y=1/3); b: x z (q_x=1/2, q_z=1/2)
    val out = js(Seq(("a", "x x y"), ("b", "x z")))
    val px = 2.0 / 3.0; val qx = 1.0 / 2.0
    val tx = 0.5 * (px * math.log(2 * px / (px + qx)) +
      qx * math.log(2 * qx / (px + qx)))
    // one-sided: y carries 1/3 of a, z carries 1/2 of b
    val want = math.round(tx * 1e9) / 1e9 +
      0.5 * math.log(2.0) * ((1.0 - px) + (1.0 - qx))
    assert(math.abs(out(("a", "b")) - want) < 1e-6)
  }

  test("bounds and pair frame: all pairs present, 0 <= js <= ln 2") {
    val rows = Seq(("a", "x y"), ("b", "x q"), ("c", "m n o"), ("d", "x y"))
    val out = js(rows)
    assert(out.size === 6) // C(4,2), including the disjoint c pairs
    out.values.foreach(v => assert(v >= 0.0 && v <= math.log(2.0) + 1e-12))
    assert(out(("a", "d")) === 0.0)
  }
}
