package graft

import org.apache.spark.sql.functions._

import graft.operators.{Funnel, Recommend}

/** r7 additions, sixth wave: Shapley channel attribution (exact
  * coalition sweep) and the damped bias baseline — textbook identities,
  * efficiency axiom, floor-division conventions. */
class ShapleyBaselineSpec extends SparkSuite {
  import spark.implicits._

  // ---- shapleyAttribution ---------------------------------------------

  test("shapley: two-channel hand case with the efficiency axiom") {
    // Sets: {a} x 2 conversions, {a,b} x 1. v({a}) = 2, v({b}) = 0,
    // v({a,b}) = 3. phi_a = (v(a)-v(0))/2 + (v(ab)-v(b))/2 = 2.5;
    // phi_b = 0/2 + 1/2 = 0.5. k! = 2 -> phi_kfact = 5, 1.
    val ev = Seq(
      (1L, 10L, "a", 1L), (1L, 20L, "conv", 2L),
      (2L, 10L, "a", 3L), (2L, 20L, "conv", 4L),
      (3L, 10L, "a", 5L), (3L, 11L, "b", 6L), (3L, 20L, "conv", 7L))
      .toDF("u", "ts", "t", "id")
    val out = Funnel.shapleyAttribution(ev, "u", "ts", "t", "id",
        "conv", Seq("a", "b"), windowNs = 100L)
      .collect().map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("phi_kfact"), r.getAs[Long]("phi_ppm"))).toMap
    assert(out("a")._1 == 5L && out("b")._1 == 1L)
    // efficiency: shares sum to ~1e6 (floor slack < k per channel)
    assert(out("a")._2 == 5000000L / 6L && out("b")._2 == 1000000L / 6L)
  }

  test("shapley: untouched channel earns exactly zero") {
    val ev = Seq((1L, 10L, "a", 1L), (1L, 20L, "conv", 2L))
      .toDF("u", "ts", "t", "id")
    val out = Funnel.shapleyAttribution(ev, "u", "ts", "t", "id",
        "conv", Seq("a", "b", "c"), windowNs = 100L)
      .collect().map(r => r.getAs[String]("channel") ->
        r.getAs[Long]("phi_kfact")).toMap
    assert(out("a") == 6L) // 3! * 1 conversion fully credited
    assert(out("b") == 0L && out("c") == 0L)
  }

  test("shapley: no conversions -> zero everywhere; channel cap refuses") {
    val ev = Seq((1L, 10L, "a", 1L)).toDF("u", "ts", "t", "id")
    val out = Funnel.shapleyAttribution(ev, "u", "ts", "t", "id",
      "conv", Seq("a", "b"), windowNs = 100L).collect()
    assert(out.forall(_.getAs[Long]("phi_ppm") == 0L))
    intercept[IllegalArgumentException] {
      Funnel.shapleyAttribution(ev, "u", "ts", "t", "id", "conv",
        (1 to 25).map(i => s"c$i"), windowNs = 100L)
    }
  }

  // ---- biasBaseline ---------------------------------------------------

  test("biasBaseline: hand damped biases, all integer ppm") {
    // ratings: (u1,a,4), (u1,b,2), (u2,a,6). mu = 4e6.
    // b_a = (0 + 2e6)/(1+2) -> floor 666666; b_b = -2e6/(1+1) = -1e6.
    // u1: ((4e6-4e6-666666) + (2e6-4e6+1e6))/(1+2) = -1666666/3
    //   -> -555555 (TRUNCATION toward zero — both engines' div).
    // u2: (6e6-4e6-666666)/(1+1) = 1333334/2 = 666667.
    val r = Seq((1L, "a", 4L), (1L, "b", 2L), (2L, "a", 6L))
      .toDF("u", "i", "r")
    val (users, items) = Recommend.biasBaseline(r, "u", "i", col("r"),
      lambda = 1L)
    val im = items.collect().map(x => x.getAs[String]("item") ->
      x.getAs[Long]("b_i_ppm")).toMap
    val um = users.collect().map(x => x.getAs[Long]("user") ->
      x.getAs[Long]("b_u_ppm")).toMap
    assert(items.collect().head.getAs[Long]("mu_ppm") == 4000000L)
    assert(im("a") == 666666L && im("b") == -1000000L)
    assert(um(1L) == -555555L)
    assert(um(2L) == 666667L)
  }

  test("biasBaseline: layout invariance and rating guard") {
    val r = spark.range(10000).select(
      pmod(col("id"), lit(100)).as("u"),
      pmod(xxhash64(col("id")), lit(50L)).as("i"),
      pmod(xxhash64(col("id"), lit(7)), lit(10L)).as("r"))
    val (u1, i1) = Recommend.biasBaseline(r, "u", "i", col("r"))
    val (u2, i2) = Recommend.biasBaseline(r.repartition(13), "u", "i",
      col("r"))
    assert(u1.collect().map(_.toSeq).toSet == u2.collect().map(_.toSeq).toSet)
    assert(i1.collect().map(_.toSeq).toSet == i2.collect().map(_.toSeq).toSet)
    intercept[Exception] {
      Recommend.biasBaseline(Seq((1L, "a", 2000000L)).toDF("u", "i", "r"),
        "u", "i", col("r"))._2.collect()
    }
  }
}
