package graft

import org.apache.spark.sql.functions._
import graft.operators.Funnel

/** Strict-order earliest-completion funnel: step rules, window anchor,
  * strictness, counts. */
class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  private def fu(rows: Seq[(String, String, Long)],
      windowNs: Long = Long.MaxValue) =
    Funnel.funnelUsers(rows.toDF("u", "t", "ts").repartition(3),
        "u", "t", "ts", steps, windowNs)
      .collect()
      .map(r => r.getString(0) ->
        ((1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))),
          r.getInt(4)))
      .toMap

  test("simple conversion and step times") {
    val got = fu(Seq(("a", "view", 0L), ("a", "click", 10L),
      ("a", "purchase", 20L)))
    assert(got("a") == ((Seq(Some(0L), Some(10L), Some(20L)), 3)))
  }

  test("steps must be strictly after the previous one; pre-step events ignored") {
    // click@5 precedes the first view -> ignored; click@15 counts
    val got = fu(Seq(("b", "click", 5L), ("b", "view", 10L),
      ("b", "click", 15L), ("b", "purchase", 20L),
      ("c", "click", 5L), ("c", "view", 10L)))
    assert(got("b") == ((Seq(Some(10L), Some(15L), Some(20L)), 3)))
    assert(got("c") == ((Seq(Some(10L), None, None), 1)))
  }

  test("equal timestamps do not advance (strict >)") {
    val got = fu(Seq(("e", "view", 10L), ("e", "click", 10L)))
    assert(got("e") == ((Seq(Some(10L), None, None), 1)))
  }

  test("window anchors at the first step-1 event") {
    val rows = Seq(("d", "view", 0L), ("d", "click", 10L),
      ("d", "purchase", 200L))
    assert(fu(rows, windowNs = 150L)("d") ==
      ((Seq(Some(0L), Some(10L), None), 2)))
    assert(fu(rows, windowNs = 200L)("d") ==
      ((Seq(Some(0L), Some(10L), Some(200L)), 3)))
    // a second, later view does NOT re-anchor
    val rows2 = rows :+ ("d", "view", 90L)
    assert(fu(rows2, windowNs = 150L)("d") ==
      ((Seq(Some(0L), Some(10L), None), 2)))
  }

  test("users without the first step are absent") {
    val got = fu(Seq(("x", "click", 1L), ("x", "purchase", 2L)))
    assert(!got.contains("x"))
  }

  test("funnelCounts: monotone step counts with names") {
    val rows = Seq(
      ("a", "view", 0L), ("a", "click", 1L), ("a", "purchase", 2L),
      ("b", "view", 0L), ("b", "click", 1L),
      ("c", "view", 0L),
      ("d", "error", 0L))
    val got = Funnel.funnelCounts(rows.toDF("u", "t", "ts"),
        "u", "t", "ts", steps)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "view", 3L), (2, "click", 2L),
      (3, "purchase", 1L)))
  }

  test("repeated step names are refused") {
    intercept[IllegalArgumentException] {
      Funnel.funnelUsers(Seq(("a", "x", 1L)).toDF("u", "t", "ts"),
        "u", "t", "ts", Seq("view", "view"))
    }
  }

  test("cohortValues: users, events, and exact cents per cell") {
    val rows = Seq(
      ("a", 1L, 100L), ("a", 2L, 50L),   // cohort 0, day 0: 2 events
      ("a", 12L, 25L),                   // cohort 0, day 1
      ("b", 5L, 10L),                    // cohort 0, day 0
      ("c", 13L, 7L))                    // cohort 1, day 0
    val got = Funnel.cohortValues(rows.toDF("u", "ts", "v")
        .repartition(3), "u", "ts", 10L, col("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      (0L, 0) -> ((2L, 3L, 160L)), // users a+b, 3 events, 160 cents
      (0L, 1) -> ((1L, 1L, 25L)),
      (1L, 0) -> ((1L, 1L, 7L))))
  }

  test("linearAttribution: equal split, window bounds, untouched conversions") {
    // user a: purchase@100 with touches view@95, click@96, view@97 ->
    //   each gets 333333 ppm (floor); purchase@200 with click@199 ->
    //   full 1000000; window excludes view@89 (too old) and click@100
    //   (not strictly before). user b: purchase@50 with NO touches.
    val rows = Seq(
      ("a", 89L, "view", 1L), ("a", 95L, "view", 2L),
      ("a", 96L, "click", 3L), ("a", 97L, "view", 4L),
      ("a", 100L, "click", 5L), ("a", 100L, "purchase", 6L),
      ("a", 199L, "click", 7L), ("a", 200L, "purchase", 8L),
      ("b", 50L, "purchase", 9L), ("b", 60L, "view", 10L))
      .toDF("u", "ts", "t", "id")
    val got = Funnel.linearAttribution(rows.repartition(3), "u", "ts",
        "t", "id", "purchase", Seq("view", "click"), windowNs = 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      "view" -> (2L, 1L, 666666L),          // two thirds of purchase 6
      "click" -> (2L, 2L, 333333L + 1000000L)))
    // conversion identity rides idCol: a second purchase at the SAME
    // (user, ts) doubles the credit rather than collapsing
    val dup = rows.union(Seq(("a", 200L, "purchase", 11L))
      .toDF("u", "ts", "t", "id"))
    val got2 = Funnel.linearAttribution(dup, "u", "ts", "t", "id",
        "purchase", Seq("view", "click"), windowNs = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got2("click") == 333333L + 2000000L)
  }

  test("attribution hot-user valve: over-cap users drop entirely, " +
      "quiet users unchanged, all four models") {
    // user a (quiet): purchase@100 with touches view@95, click@96.
    // user h (hot): 5 views then a purchase — over a maxUserTouches=4
    // cap its touches AND its conversion must vanish from every model.
    val quiet = Seq(
      ("a", 95L, "view", 1L), ("a", 96L, "click", 2L),
      ("a", 100L, "purchase", 3L))
    val hot = (0 until 5).map(i => ("h", 90L + i, "view", 10L + i)) :+
      (("h", 100L, "purchase", 20L))
    val ev = (quiet ++ hot).toDF("u", "ts", "t", "id").repartition(3)
    val quietOnly = quiet.toDF("u", "ts", "t", "id")
    def rollup(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val lin = Funnel.linearAttribution(ev, "u", "ts", "t", "id",
      "purchase", Seq("view", "click"), windowNs = 10L,
      maxUserTouches = 4)
    assert(rollup(lin) == rollup(Funnel.linearAttribution(quietOnly,
      "u", "ts", "t", "id", "purchase", Seq("view", "click"), 10L)))
    val pos = Funnel.positionAttribution(ev, "u", "ts", "t", "id",
      "purchase", Seq("view", "click"), windowNs = 10L,
      maxUserTouches = 4)
    assert(rollup(pos) == rollup(Funnel.positionAttribution(quietOnly,
      "u", "ts", "t", "id", "purchase", Seq("view", "click"), 10L)))
    val dec = Funnel.timeDecayAttribution(ev, "u", "ts", "t", "id",
      "purchase", Seq("view", "click"), windowNs = 10L,
      halfLifeNs = 3L, maxUserTouches = 4)
    assert(rollup(dec) == rollup(Funnel.timeDecayAttribution(quietOnly,
      "u", "ts", "t", "id", "purchase", Seq("view", "click"), 10L, 3L)))
    val shap = Funnel.shapleyAttribution(ev, "u", "ts", "t", "id",
      "purchase", Seq("view", "click"), windowNs = 10L,
      maxUserTouches = 4)
    assert(rollup(shap) == rollup(Funnel.shapleyAttribution(quietOnly,
      "u", "ts", "t", "id", "purchase", Seq("view", "click"), 10L)))
    // at the default cap the hot user is well under and contributes
    val full = Funnel.linearAttribution(ev, "u", "ts", "t", "id",
      "purchase", Seq("view", "click"), windowNs = 10L)
    assert(rollup(full)("view")._2 == 2L) // both conversions touched
  }

  test("basketPairs: hand support/conf/lift, maxBasket valve, minSupport cut") {
    import graft.operators.GroupOps
    // baskets: 1:{x,y} 2:{x,y} 3:{x,z} 4:{y} -> sup(xy)=2, cnt x=3 y=3
    // z=1, N=4; lift(xy) = 2*4/(3*3)
    val rows = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (2L, "y"),
      (3L, "x"), (3L, "z"), (4L, "y"))
    val out = GroupOps.basketPairs(rows.toDF("bk", "it"), "bk", "it",
        minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(7)))).toMap
    assert(out.keySet == Set(("x", "y"))) // xz/yz below minSupport
    assert(out(("x", "y")) == ((2L, 3L, 3L, 4L, 2.0 * 4 / 9)))
    // a 3-item basket dropped by maxBasket=2 contributes no pairs but
    // its items/baskets leave the universe too
    val big = rows ++ Seq((5L, "x"), (5L, "y"), (5L, "z"))
    val out2 = GroupOps.basketPairs(big.toDF("bk", "it"), "bk", "it",
        minSupport = 2L, maxBasket = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(5)).toMap
    assert(out2(("x", "y")) == 4L) // N excludes the dropped basket
  }

  test("concentration: uniform -> gini 0, single-group dominance, exact numerator") {
    import graft.operators.GroupOps
    val uni = Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 5L))
      .toDF("g", "w")
    val u = GroupOps.concentration(uni, col("g"), col("w")).head
    assert(u.getLong(0) == 4L && u.getLong(1) == 20L)
    // uniform: 2*(1+2+3+4)*5 - 5*20 = 100 - 100 = 0
    assert(u.getLong(2) == 0L && u.getDouble(3) == 0.0)
    assert(u.getDouble(4) == 4.0 * 25 / 400) // HHI = 1/n
    // all mass on one group of three: gini = (2*3*9 - 4*9)/(3*9) = 2/3
    val dom = Seq(("a", 0L), ("b", 0L), ("c", 9L)).toDF("g", "w")
    val d = GroupOps.concentration(dom, col("g"), col("w")).head
    assert(d.getLong(2) == 2L * 3 * 9 - 4 * 9)
    assert(d.getDouble(3) == 18.0 / 27 && d.getDouble(4) == 1.0)
  }

  test("retentionCohorts: hand case — cohorts, offsets, counts") {
    val day = 10L // tiny period for readability
    val rows = Seq(
      ("a", 1L), ("a", 12L), ("a", 25L), // cohort 0, active days 0,1,2
      ("b", 5L), ("b", 27L),             // cohort 0, active days 0,2
      ("c", 13L), ("c", 14L),            // cohort 1, active day 1 (once)
      ("d", 21L))                        // cohort 2, active day 2
    val got = Funnel.retentionCohorts(rows.toDF("u", "ts").repartition(3),
        "u", "ts", day)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      (0L, 0) -> 2L, (0L, 1) -> 1L, (0L, 2) -> 2L,
      (1L, 0) -> 1L,
      (2L, 0) -> 1L))
  }
}
