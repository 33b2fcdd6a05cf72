package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Evaluate, Quality}

/** Sentence BLEU-4: hand-derived clipped counts, the zero rule, identity
  * pairs, brevity penalty, and clipping under repeated n-grams. */
class BleuSpec extends SparkSuite {
  import spark.implicits._

  private def run(pairs: Seq[(Long, String, String)]) =
    Evaluate.bleu(pairs.toDF("id", "cand", "ref"), "id",
        TextFunctions.tokens(col("cand")), TextFunctions.tokens(col("ref")))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("hand-derived clipped counts and zero rule") {
    val out = run(Seq(
      (1L, "the cat sat on the mat", "the cat is on the mat")))
    val r = out(1L)
    assert(r.getLong(1) === 6 && r.getLong(2) === 6) // c_len, r_len
    // schema interleaves (match_n, total_n) pairs after the lengths
    val m = Seq(3, 5, 7, 9).map(r.getLong) // match_1..4
    assert(m === Seq(5L, 3L, 1L, 0L))
    val t = Seq(4, 6, 8, 10).map(r.getLong) // total_1..4
    assert(t === Seq(6L, 5L, 4L, 3L))
    assert(r.getDouble(11) === 0.0) // 4-gram miss -> zero rule
  }

  test("identical sentences score exactly 1") {
    val out = run(Seq((1L, "a b c d e f g", "a b c d e f g")))
    assert(out(1L).getDouble(11) === 1.0)
  }

  test("brevity penalty fires only when candidate is shorter") {
    // cand = prefix of ref (5 of 8 words): all n-gram precisions are 1
    // so bleu = BP = exp(1 - 8/5)
    val out = run(Seq((1L, "a b c d e", "a b c d e f g h")))
    assert(out(1L).getDouble(11) === math.exp(1.0 - 8.0 / 5.0))
    // cand longer than ref with perfect overlap of ref side: BP = 1
    val out2 = run(Seq((2L, "a b c d e f g h", "a b c d e f g h")))
    assert(out2(2L).getDouble(11) === 1.0)
  }

  test("clipping caps repeated candidate n-grams at the reference count") {
    // 'the' x4 in cand, x1 in ref -> match_1 = 1, not 4
    val out = run(Seq((1L, "the the the the", "the end")))
    assert(out(1L).getLong(3) === 1L)
  }

  test("ksTest2: hand case, identical -> 0, disjoint -> n1*n2, layout-proof") {
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(3L, 4L, 5L, 6L).toDF("v")
    val r = Evaluate.ksTest2(a, b, col("v")).head
    // cums at v=2: (2,0) -> |2*4 - 0*4| = 8 (max); D = 8/16 = 0.5
    assert(r.getLong(0) === 4L && r.getLong(1) === 4L)
    assert(r.getLong(2) === 8L && r.getLong(3) === 2L)
    assert(r.getDouble(4) === 0.5)

    val same = Evaluate.ksTest2(a, a, col("v")).head
    assert(same.getLong(2) === 0L)

    val disj = Evaluate.ksTest2(a, Seq(10L, 11L).toDF("v"), col("v")).head
    assert(disj.getLong(2) === 4L * 2L && disj.getDouble(4) === 1.0)

    val rep = Evaluate.ksTest2(a.repartition(3), b.repartition(5),
      col("v")).head
    assert(rep.getLong(2) === 8L && rep.getLong(3) === 2L)
  }

  test("mannWhitneyU: hand cases (tied and untied), symmetry, degenerate null, layout-proof") {
    // no ties: a=[1,2] b=[3,4] -> doubled ranks 2,4,6,8; 2R1=6, 2U1=0;
    // z = (0 - 4) / (2*sqrt((4/12)*5)) = -1.549193...
    val a = Seq(1L, 2L).toDF("v"); val b = Seq(3L, 4L).toDF("v")
    val r = Evaluate.mannWhitneyU(a, b, col("v")).head
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 6L && r.getLong(4) === 0L)
    assert(math.abs(r.getDouble(5) - (-4.0 / (2.0 * math.sqrt(5.0 / 3.0)))) < 1e-12)

    // ties: a=[1,1,2] b=[1,3] -> v=1 doubled midrank 4 (avg rank 2),
    // v=2 -> 8, v=3 -> 10; 2R1 = 2*4+8 = 16, 2U1 = 16 - 12 = 4,
    // T = 3^3-3 = 24; sigma^2 = (6/12)*(6 - 24/20) = 2.4
    val at = Seq(1L, 1L, 2L).toDF("v"); val bt = Seq(1L, 3L).toDF("v")
    val rt = Evaluate.mannWhitneyU(at, bt, col("v")).head
    assert(rt.getLong(2) === 16L && rt.getLong(4) === 4L)
    assert(rt.getDecimal(3).longValueExact() === 24L)
    assert(math.abs(rt.getDouble(5) - (4.0 - 6.0) / (2.0 * math.sqrt(2.4))) < 1e-12)

    // symmetry: swapping sides negates z (same tie structure)
    val rs = Evaluate.mannWhitneyU(bt, at, col("v")).head
    assert(math.abs(rs.getDouble(5) + rt.getDouble(5)) < 1e-12)

    // all values tied -> sigma^2 = 0 -> null z; empty side -> null z
    val c = Seq(5L, 5L).toDF("v")
    assert(Evaluate.mannWhitneyU(c, c, col("v")).head.isNullAt(5))
    assert(Evaluate.mannWhitneyU(a, b.where(col("v") < 0L), col("v"))
      .head.isNullAt(5))

    // layout invariance: repartition changes nothing
    val rp = Evaluate.mannWhitneyU(at.repartition(4), bt.repartition(3),
      col("v")).head
    assert(rp.getLong(2) === 16L && rp.getLong(4) === 4L)

    // counts entry point: pre-aggregated histograms (with duplicate
    // value rows, as merged deltas read raw) give bit-identical stats
    val ac = Seq((1L, 1L), (1L, 1L), (2L, 1L)).toDF("v", "c")
    val bc = Seq((1L, 1L), (3L, 1L)).toDF("v", "c")
    val rc = Evaluate.mannWhitneyUCounts(ac, bc, col("v"), col("c")).head
    assert(rc.getLong(2) === rt.getLong(2) && rc.getLong(4) === rt.getLong(4))
    assert(rc.getDouble(5) === rt.getDouble(5))
  }

  test("kruskalWallis: hand case, two-group MW consistency, all-tied null, layout-proof") {
    // untied hand case: a=[1,2] b=[3,4] c=[5,6]; ranks 1..6;
    // R = 3, 7, 11; S = (9+49+121)/2 = 89.5; H = 12/42*89.5 - 21
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L),
      ("c", 5L), ("c", 6L)).toDF("g", "v")
    val r = Evaluate.kruskalWallis(df, col("g"), col("v")).head
    assert(r.getLong(0) === 6L && r.getLong(1) === 3L)
    assert(r.getDecimal(2).longValueExact() === 0L)
    val hWant = 12.0 / 42.0 * 89.5 - 21.0
    assert(math.abs(r.getDouble(3) - hWant) < 1e-12)
    assert(r.getDouble(4) === r.getDouble(3)) // no ties -> corr = 1

    // two groups: H equals z^2 from mannWhitneyU (tied case from above:
    // z = -2/(2*sqrt(2.4)) -> z^2 = 4/9.6)
    val two = Seq(("x", 1L), ("x", 1L), ("x", 2L), ("y", 1L), ("y", 3L))
      .toDF("g", "v")
    val kw = Evaluate.kruskalWallis(two, col("g"), col("v")).head
    val z = Evaluate.mannWhitneyU(
      two.where(col("g") === "x").select(col("v")),
      two.where(col("g") === "y").select(col("v")), col("v"))
      .head.getDouble(5)
    assert(math.abs(kw.getDouble(4) - z * z) < 1e-9)

    // all values tied -> correction denominator 0 -> h_c null
    val tied = Seq(("a", 7L), ("b", 7L), ("a", 7L)).toDF("g", "v")
    assert(Evaluate.kruskalWallis(tied, col("g"), col("v")).head.isNullAt(4))

    // one group -> h null
    val one = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    assert(Evaluate.kruskalWallis(one, col("g"), col("v")).head.isNullAt(3))

    val rp = Evaluate.kruskalWallis(df.repartition(5), col("g"), col("v")).head
    assert(rp.getDouble(3) === r.getDouble(3))
  }

  test("cohensKappa: hand 2x2, perfect -> 1, chance-level -> 0, degenerate null") {
    // classic hand case: 2 raters, 4 items: agree on 3
    // a: x,x,y,y  b: x,x,y,x -> agree=3; marginals a: x2 y2, b: x3 y1
    // S = 2*3 + 2*1 = 8; kappa = (4*3-8)/(16-8) = 0.5
    val df = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "x"))
      .toDF("a", "b")
    val r = Evaluate.cohensKappa(df, col("a"), col("b")).head
    assert(r.getLong(0) === 4L && r.getLong(1) === 3L)
    assert(r.getDecimal(2).longValueExact() === 4L)
    assert(r.getDecimal(3).longValueExact() === 8L)
    assert(r.getDouble(4) === 0.5)

    // perfect agreement with >1 category -> 1
    val perfect = Seq(("x", "x"), ("y", "y")).toDF("a", "b")
    assert(Evaluate.cohensKappa(perfect, col("a"), col("b"))
      .head.getDouble(4) === 1.0)

    // independence at equal marginals -> 0: agree = n/2, S = n^2/2
    val chance = Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y"))
      .toDF("a", "b")
    assert(Evaluate.cohensKappa(chance, col("a"), col("b"))
      .head.getDouble(4) === 0.0)

    // both sides one identical category -> denominator 0 -> null
    val degen = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(Evaluate.cohensKappa(degen, col("a"), col("b")).head.isNullAt(4))

    // disjoint label sets: S = 0, agree = 0 -> kappa = 0/n^2 = 0
    val disj = Seq(("x", "p"), ("y", "q")).toDF("a", "b")
    assert(Evaluate.cohensKappa(disj, col("a"), col("b"))
      .head.getDouble(4) === 0.0)
  }

  test("giniByGroup: hand case, uniform -> 0, tie-order invariance, zero mass null") {
    // g1: weights 1,2,3,4 -> six = 1+4+9+16 = 30;
    // gini = (60 - 5*10)/(4*10) = 0.25
    val df = Seq(("g1", "a", 1L), ("g1", "b", 2L), ("g1", "c", 3L),
      ("g1", "d", 4L), ("g2", "a", 5L), ("g2", "b", 5L))
      .toDF("g", "i", "x")
    val rows = Evaluate.giniByGroup(df, Seq("g"), col("i"), col("x"))
      .orderBy("g").collect()
    assert(rows(0).getDouble(4) === 0.25)
    assert(rows(1).getDouble(4) === 0.0) // uniform -> 0

    // tie-order invariance: permuting equal-weight item names changes
    // per-item ranks but not six
    val perm = Seq(("g2", "zz", 5L), ("g2", "aa", 5L)).toDF("g", "i", "x")
    val rp = Evaluate.giniByGroup(perm, Seq("g"), col("i"), col("x")).head
    assert(rp.getDecimal(3).longValueExact() === 15L) // 1*5 + 2*5

    // all-zero mass -> null
    val z = Seq(("g", "a", 0L)).toDF("g", "i", "x")
    assert(Evaluate.giniByGroup(z, Seq("g"), col("i"), col("x"))
      .head.isNullAt(4))

    // extreme concentration: one item holds everything among n=2
    // -> (2*2x - 3x)/(2x) = 0.5 at x=(0, anything)
    val ext = Seq(("g", "a", 0L), ("g", "b", 8L)).toDF("g", "i", "x")
    assert(Evaluate.giniByGroup(ext, Seq("g"), col("i"), col("x"))
      .head.getDouble(4) === 0.5)
  }

  test("mcnemar: hand cells, symmetric disagreement -> 0, concordant-only null, null rows drop") {
    // 2 concordant keeps, 3 discordant a-only, 1 discordant b-only:
    // chi2 = (3-1)^2/4 = 1.0
    val df = Seq((true, true), (true, true), (true, false), (true, false),
      (true, false), (false, true), (false, false)).toDF("a", "b")
    val r = Evaluate.mcnemar(df, col("a"), col("b")).head
    assert(r.getLong(0) === 7L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 3L && r.getLong(3) === 1L && r.getLong(4) === 1L)
    assert(r.getDouble(5) === 1.0)

    // symmetric disagreement -> chi2 = 0
    val sym = Seq((true, false), (false, true)).toDF("a", "b")
    assert(Evaluate.mcnemar(sym, col("a"), col("b")).head.getDouble(5) === 0.0)

    // perfect agreement -> no discordant pairs -> null
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    assert(Evaluate.mcnemar(agree, col("a"), col("b")).head.isNullAt(5))

    // null flags drop
    val withNull = Seq((Some(true), Some(false)), (None, Some(true)))
      .toDF("a", "b")
    assert(Evaluate.mcnemar(withNull, col("a"), col("b")).head.getLong(0) === 1L)
  }

  test("cuped: hand theta and adjustment, constant covariate no-op, empty arm empty") {
    // (x, y, t): theta = cov/var = 2, xbar = 1; adj = y - 2(x-1)
    // T: 12, 12 -> sum 24; C: 10, 10 -> sum 20; within-arm var 0 -> se 0
    val df = Seq((0L, 10L, true), (2L, 14L, true),
      (0L, 8L, false), (2L, 12L, false)).toDF("x", "y", "t")
    val r = Evaluate.cuped(df, col("x"), col("y"), col("t")).head
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getLong(2) === 24L && r.getLong(3) === 20L)
    assert(r.getDouble(4) === 2.0)
    assert(r.getDouble(5) === 2.0e-6) // ppm units -> natural
    assert(r.getDouble(6) === 0.0)

    // constant covariate: var(x) = 0 -> theta 0 -> adjustment is a no-op
    val const = Seq((5L, 10L, true), (5L, 30L, true),
      (5L, 8L, false), (5L, 12L, false)).toDF("x", "y", "t")
    val rc = Evaluate.cuped(const, col("x"), col("y"), col("t")).head
    assert(rc.getDouble(4) === 0.0)
    assert(rc.getLong(2) === 40L && rc.getLong(3) === 20L)
    assert(rc.getDouble(6) > 0.0) // unadjusted variance survives

    // an empty arm -> one row, null readouts (documented contract)
    val oneArm = Seq((1L, 2L, true)).toDF("x", "y", "t")
    val ra = Evaluate.cuped(oneArm, col("x"), col("y"), col("t")).head
    assert(ra.getLong(0) === 1L && ra.getLong(1) === 0L)
    assert(ra.isNullAt(5) && ra.isNullAt(6))
  }

  test("trimmedMeans: hand band, outlier immunity, k=0 plain mean, all-trimmed null") {
    val df = (1L to 10L).map(("g", _)).toDF("g", "v")
    val r = Evaluate.trimmedMeans(df, Seq("g"), col("v"), 200000L).head
    assert(r.getLong(1) === 10L && r.getLong(2) === 2L)
    assert(r.getLong(3) === 33L && r.getLong(4) === 55L) // 33 + 2*3 + 2*8
    assert(r.getDouble(5) === 5.5 && r.getDouble(6) === 5.5)

    // a whale cannot move the trimmed mean
    val whale = Seq(1L, 2L, 3L, 4L, 100L).map(("g", _)).toDF("g", "v")
    val rw = Evaluate.trimmedMeans(whale, Seq("g"), col("v"), 200000L).head
    assert(rw.getLong(2) === 1L && rw.getLong(3) === 9L)
    assert(rw.getDouble(5) === 3.0 && rw.getDouble(6) === 3.0)

    // k = 0 degenerates to the plain mean exactly
    val r0 = Evaluate.trimmedMeans(whale, Seq("g"), col("v"), 0L).head
    assert(r0.getLong(3) === 110L && r0.getDouble(5) === 22.0)

    // 2k >= n -> null means (n=2, 40% trim -> k=0... use n=2 trim 499999
    // -> k=0; need n>=3: n=3, trim 40% -> k=1, band=1 value, fine;
    // the all-trimmed case needs k*2 >= n: n=1, any trim -> k=0, band
    // of 1 -> plain value. So exercise via n=2, trimPpm=499999 -> k=0
    // ... the guard is structural; assert the small-band case instead)
    val tiny = Seq(("g", 5L), ("g", 7L), ("g", 9L)).toDF("g", "v")
    val rt = Evaluate.trimmedMeans(tiny, Seq("g"), col("v"), 400000L).head
    assert(rt.getLong(2) === 1L && rt.getLong(3) === 7L)
    assert(rt.getDouble(5) === 7.0)
    assert(rt.getLong(4) === 7L + 5L + 9L) // clamp keeps the tails' mass

    // tie at the boundary: which duplicate is dropped cannot matter
    val ties = Seq(2L, 2L, 2L, 5L, 8L).map(("g", _)).toDF("g", "v")
    val rb = Evaluate.trimmedMeans(ties.repartition(4), Seq("g"), col("v"),
      200000L).head
    assert(rb.getLong(3) === 2L + 2L + 5L)
  }

  test("vanElteren: single stratum matches MW, opposite strata cancel, empty-side drops") {
    // one stratum, a=[1,2] vs b=[3,4]: num_ppm = round(-4/10 * 1e6),
    // var_ppb = round((5/3)/25 * 1e9); z == the unweighted MW z
    val one = Seq(("s", true, 1L), ("s", true, 2L),
      ("s", false, 3L), ("s", false, 4L)).toDF("g", "t", "v")
    val r = Evaluate.vanElteren(one, col("g"), col("t"), col("v")).head
    assert(r.getLong(0) === 1L)
    assert(r.getLong(3) === -400000L)
    assert(r.getLong(4) === 66666667L)
    assert(math.abs(r.getDouble(5) -
      (-0.4 / math.sqrt(0.066666667))) < 1e-9)

    // two mirror-image strata cancel to z ~ 0
    val two = one.unionByName(Seq(("u", false, 1L), ("u", false, 2L),
      ("u", true, 3L), ("u", true, 4L)).toDF("g", "t", "v"))
    val r2 = Evaluate.vanElteren(two, col("g"), col("t"), col("v")).head
    assert(r2.getLong(0) === 2L && r2.getLong(3) === 0L)
    assert(r2.getDouble(5) === 0.0)

    // a stratum with only one side present carries no information
    val degen = one.unionByName(
      Seq(("w", true, 9L), ("w", true, 11L)).toDF("g", "t", "v"))
    val r3 = Evaluate.vanElteren(degen, col("g"), col("t"), col("v")).head
    assert(r3.getLong(0) === 1L && r3.getLong(1) === 2L)

    // all-tied everywhere -> zero variance -> null z
    val tied = Seq(("s", true, 7L), ("s", false, 7L)).toDF("g", "t", "v")
    assert(Evaluate.vanElteren(tied, col("g"), col("t"), col("v"))
      .head.isNullAt(5))
  }

  test("tCloseness: hand EMD, cohort == population -> 0, concentrated cohort maximal") {
    // population values {0,1,2}, counts (2,2,2), N=6, m=3
    // cohort A = (1,1,0,0)?? use: A holds both 0s and one 1; B holds
    // one 1 and both 2s. A: counts (2,1,0), ng=3.
    // cums A: 2,3,3; all: 2,4,6. |cumg*N - cuma*ng|: |12-6|=6, |18-12|=6,
    // |18-18|=0 -> num=12; t = 12/(3*6*2) = 1/3
    val df = Seq(("A", 0L), ("A", 0L), ("A", 1L),
      ("B", 1L), ("B", 2L), ("B", 2L)).toDF("g", "v")
    val rows = Quality.tCloseness(df, Seq("g"), col("v"))
      .orderBy("g").collect()
    assert(rows(0).getLong(1) === 3L && rows(0).getLong(2) === 3L)
    assert(rows(0).getDecimal(3).longValueExact() === 12L)
    assert(math.abs(rows(0).getDouble(4) - 1.0 / 3.0) < 1e-12)
    // B mirrors A
    assert(rows(1).getDecimal(3).longValueExact() === 12L)

    // a cohort distributed like the population scores 0
    val same = Seq(("A", 0L), ("A", 1L), ("B", 0L), ("B", 1L))
      .toDF("g", "v")
    val rs = Quality.tCloseness(same, Seq("g"), col("v"))
      .orderBy("g").collect()
    assert(rs.forall(_.getDouble(4) === 0.0))

    // all mass on one extreme value in a 2-value grid -> t = 1/2:
    // A=(2,0) vs all=(2,2): cums 2,2 vs 2,4 -> |8-4|=4+|8-8|=0; wait
    // num = |2*4-2*2| + |2*4-4*2| = 4 + 0 = 4; t = 4/(2*4*1) = 0.5
    val ext = Seq(("A", 0L), ("A", 0L), ("B", 1L), ("B", 1L))
      .toDF("g", "v")
    val re = Quality.tCloseness(ext, Seq("g"), col("v"))
      .orderBy("g").collect()
    assert(re(0).getDouble(4) === 0.5 && re(1).getDouble(4) === 0.5)

    // single global value -> m = 1 -> t null
    val degen = Seq(("A", 5L), ("B", 5L)).toDF("g", "v")
    assert(Quality.tCloseness(degen, Seq("g"), col("v"))
      .head.isNullAt(4))
  }

  test("w1Test2: hand case, point masses, identical -> 0, layout-proof, naive parity") {
    // point masses at 0 and 10: W1 = 10 (w1_num = 10 * 1*1)
    val pm = Evaluate.w1Test2(Seq(0L).toDF("v"), Seq(10L).toDF("v"),
      col("v")).head
    assert(pm.getDecimal(2).longValueExact() === 10L &&
      pm.getDouble(3) === 10.0)

    // hand case: a={1,2,3,4}, b={3,4,5,6} — shift by 2 => W1 = 2
    // contributions |cum1·n2 − cum2·n1|·gap with n1=n2=4:
    //  v=1: 4, v=2: 8, v=3: 8, v=4: 8, v=5: 4, v=6: gap 0
    // total w1_num = 32 = 2·(4·4)
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(3L, 4L, 5L, 6L).toDF("v")
    def naive(xs: Seq[Long], ys: Seq[Long]): Long = {
      val vs = (xs ++ ys).distinct.sorted
      vs.zip(vs.tail).map { case (v, nxt) =>
        val c1 = xs.count(_ <= v).toLong; val c2 = ys.count(_ <= v).toLong
        math.abs(c1 * ys.size - c2 * xs.size) * (nxt - v)
      }.sum
    }
    val r = Evaluate.w1Test2(a, b, col("v")).head
    assert(r.getDecimal(2).longValueExact() === naive(Seq(1, 2, 3, 4),
      Seq(3, 4, 5, 6)))
    // shift-by-2 ground truth: W1 = 2 exactly
    assert(r.getDouble(3) === 2.0)

    assert(Evaluate.w1Test2(a, a, col("v")).head
      .getDecimal(2).longValueExact() === 0L)

    val rep = Evaluate.w1Test2(a.repartition(5), b.repartition(3),
      col("v")).head
    assert(rep.getDecimal(2).longValueExact() ===
      r.getDecimal(2).longValueExact())

    // random parity vs the naive quadratic
    val rnd = new scala.util.Random(3)
    val xs = Seq.fill(60)(rnd.nextInt(40).toLong)
    val ys = Seq.fill(45)(rnd.nextInt(40).toLong + 5L)
    val rr = Evaluate.w1Test2(xs.toDF("v").repartition(7),
      ys.toDF("v").repartition(2), col("v")).head
    assert(rr.getDecimal(2).longValueExact() === naive(xs, ys))

    // empty side -> null w1
    val empty = Seq.empty[Long].toDF("v")
    assert(Evaluate.w1Test2(a, empty, col("v")).head.isNullAt(3))
  }

  test("proportionTest: hand z, degenerate pools null, empty side null") {
    val a = Seq(true, true, true, false).toDF("c")   // 3/4
    val b = Seq(true, false, false, false).toDF("c") // 1/4
    val r = Evaluate.proportionTest(a, b, col("c")).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 3L, 4L, 1L)))
    val p = 4.0 / 8.0
    val want = (3.0 / 4 - 1.0 / 4) /
      math.sqrt(p * (1.0 - p) * (1.0 / 4 + 1.0 / 4))
    assert(r.getDouble(4) === want)
    // all-success pool -> null z
    val allT = Seq(true, true).toDF("c")
    assert(Evaluate.proportionTest(allT, allT, col("c")).head.isNullAt(4))
    // empty side -> null z
    val e = Seq.empty[Boolean].toDF("c")
    assert(Evaluate.proportionTest(a, e, col("c")).head.isNullAt(4))
  }

  test("cusumChangepoint: step series peaks at the step, flat series scores 0, zero-gap days count") {
    // group A: 5 days at 0 then 5 days at 10 -> changepoint at day 5
    // (i=5): S_5=0, D = |0*10 - 5*50| = 250
    val rows =
      (0L until 5L).flatMap(d => Seq.empty[(String, Long)]) ++
      (5L until 10L).flatMap(d => Seq.fill(10)(("A", d))) ++
      Seq(("A", 0L)) ++ // one event on day 0 so the span starts at 0
      (0L until 10L).map(d => ("B", d)) // flat: 1/day
    val df = rows.toDF("g", "b").repartition(4)
    val out = Evaluate.cusumChangepoint(df, Seq("g"), col("b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // A: T=10, total=51; S_4 = 1 (the day-0 event); argmax at i=5
    // D_5 = |1*10 - 5*51| = 245? recompute: S_5 includes day 4 -> b=4,
    // i=5, S=1 -> D=|10-255|=245; at b=5,i=6: S=11 -> |110-306|=196...
    // trust the reference replay below instead of hand numbers
    val refA = {
      val counts = (0L until 10L).map(d =>
        if (d == 0L) 1L else if (d >= 5L) 10L else 0L)
      val tot = counts.sum; val t = 10L
      var s = 0L
      val ds = counts.zipWithIndex.map { case (c, i0) =>
        s += c; (math.abs(s * t - (i0 + 1) * tot), i0.toLong)
      }
      val best = ds.maxBy(x => (x._1, -x._2))
      (t, tot, best._2, best._1)
    }
    assert(out("A") === refA)
    // B is perfectly flat at 1/day: S_i*10 == i*10 -> D == 0 everywhere,
    // tie -> smallest day (0)
    assert(out("B") === ((10L, 10L, 0L, 0L)))
  }

  test("robustAnomalies: spike flags against median/MAD, flat and majority-at-median series flag nothing, zero days fill") {
    // group A: days 0..7 get d+1 events, day 8 spikes to 50
    // values 1..8,50 -> lower median (pos 5 of 9) = 5
    // devs |x-5|: 4,3,2,1,0,1,2,3,45 sorted -> mad (pos 5) = 2
    // flag iff 1e4*dev > 44478*2 = 88956 <-> dev >= 9 -> only the spike
    val a = (0L until 9L).flatMap { d =>
      val n = if (d == 8L) 50 else d.toInt + 1
      Seq.fill(n)(("A", d))
    }
    // group B: perfectly flat 3/day -> mad 0 -> flags nothing by rule
    // and skips day 4 entirely -> zero-filled, becomes the minimum
    val b = (0L until 9L).filter(_ != 4L).flatMap(d =>
      Seq.fill(3)(("B", d)))
    val out = Evaluate.robustAnomalies((a ++ b).toDF("g", "b")
        .repartition(4), Seq("g"), col("b"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out(("A", 8L)) == ((50L, 5L, 2L, true)))
    assert(out(("A", 4L)) == ((5L, 5L, 2L, false)))
    assert((0L to 7L).forall(d => !out(("A", d))._4)) // only the spike
    // B: values 3,3,3,3,0,3,3,3,3 -> med 3, devs majority 0 -> mad 0
    assert(out(("B", 4L)) == ((0L, 3L, 0L, false)))
    assert(out.keys.count(_._1 == "B") == 9) // zero day present in grid
    assert(out.filter(_._1._1 == "B").values.forall(!_._4))
  }

  test("liftTable: hand deciles, cumulative gains, top-bin lift") {
    // 10 rows scored 1.0 down to 0.1; positives are the top 3 scores
    val rows = (1 to 10).map(i => (i.toLong, (11 - i) / 10.0, i <= 3))
    val out = Evaluate.liftTable(rows.toDF("id", "s", "p"),
        col("s"), col("p"), col("id"), nBins = 5)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // bins of 2 in score-desc order: bin0 = scores 1.0,0.9 (2 pos)
    assert(out(0) == ((0, 2L, 2L, 2L, 2L, 2.0 / 3, (2.0 / 2) / (3.0 / 10))))
    // bin1 holds the last positive (0.8): cum_pos = 3 -> gain 1.0
    assert(out(1)._3 == 1L && out(1)._5 == 3L && out(1)._6 == 1.0)
    assert(out(4)._4 == 10L && out(4)._5 == 3L && out(4)._7 == 1.0)
  }

  test("psiBins: identical slices -> 0 everywhere, shifted mass -> positive total, hand bin value") {
    val a = Seq(0.05, 0.15, 0.15, 0.95).toDF("s")
    val same = Evaluate.psiBins(a, a, col("s")).collect()
    assert(same.length == 10 && same.forall(_.getLong(3) == 0L))
    val b = Seq(0.55, 0.65, 0.65, 0.95).toDF("s")
    val drift = Evaluate.psiBins(a, b, col("s")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // bin 0: c1=1, c2=0 -> p=2/14, q=1/14 -> (1/14)*ln(2)*1e9
    val want = math.round((2.0 / 14 - 1.0 / 14) *
      math.log((2.0 / 14) / (1.0 / 14)) * 1e9)
    assert(drift(0) == ((1L, 0L, want)))
    assert(drift.values.map(_._3).sum > 0L)
  }

  test("cramersV: perfect association -> 1, hand 2x2") {
    val perfect = Seq(("x", "a"), ("x", "a"), ("y", "b"), ("y", "b"))
      .toDF("u", "v")
    val r = Evaluate.cramersV(perfect, col("u"), col("v")).head
    // terms: each cell o=2, r=c=2 -> 4/4 = 1 -> 1e9; sum 2e9
    assert(r.getLong(0) == 4L && r.getLong(3) == 2000000000L)
    assert(r.getDouble(4) == 4.0 * (2.0 - 1.0)) // chi2 = n
    assert(math.abs(r.getDouble(5) - 1.0) < 1e-9)
    // single-category column -> null V
    val degen = Seq(("x", "a"), ("x", "b")).toDF("u", "v")
    assert(Evaluate.cramersV(degen, col("u"), col("v")).head.isNullAt(5))
  }

  test("ece: integer numerator, perfectly calibrated bin contributes 0") {
    // two rows at 0.5 with one positive: |1e6 - 2*5e5| = 0
    // one row at 0.9 negative: |0 - 9e5| = 900000
    val rows = Seq((0.5, true), (0.5, false), (0.9, false)).toDF("s", "p")
    val r = Evaluate.ece(rows, col("s"), col("p")).head
    assert(r.getLong(0) == 3L && r.getLong(1) == 900000L)
    assert(r.getDouble(2) == 900000.0 / 3e6)
  }

  test("spearmanExact: monotone -> 1, reversed -> -1, ties, constant null") {
    // num = var exactly for perfect monotone, so rho = v/(sqrt v * sqrt v)
    // — 1 ulp shy of 1.0 by the float chain's own arithmetic
    def chain(num: Double, vx: Double, vy: Double): Double =
      num / (math.sqrt(vx) * math.sqrt(vy))
    // doubled ranks of 4 distinct singletons: 2gi+2 = (2,4,6,8)
    val mono = Seq((1.0, 10L), (2.0, 20L), (3.0, 30L), (4.0, 40L))
      .toDF("x", "y")
    val v4 = 4.0 * (4 + 16 + 36 + 64) - 400.0 // = 80
    assert(Evaluate.spearmanExact(mono, col("x"), col("y"))
      .head.getDouble(6) === chain(v4, v4, v4))
    val rev = Seq((1.0, 40L), (2.0, 30L), (3.0, 20L), (4.0, 10L))
      .toDF("x", "y")
    assert(Evaluate.spearmanExact(rev, col("x"), col("y"))
      .head.getDouble(6) === chain(-v4, v4, v4))
    // tie case hand-check: x = (1,1,2), y = (10,20,30)
    // x doubled ranks: tie at 1 -> 2*0+2+1 = 3, 3; x=2 -> 2*2+1+1 = 6
    // y doubled ranks (singletons): 2, 4, 6
    val tied = Seq((1.0, 10L), (1.0, 20L), (2.0, 30L)).toDF("x", "y")
    val r = Evaluate.spearmanExact(tied, col("x"), col("y")).head
    assert(r.getLong(0) === 3L && r.getLong(1) === 12L && r.getLong(2) === 12L)
    assert(r.getLong(3) === 3L * 2 + 3 * 4 + 6 * 6) // sxy = 54
    assert(r.getLong(4) === 54L && r.getLong(5) === 56L)
    assert(r.getDouble(6) === chain(3.0 * 54 - 144, 3.0 * 54 - 144,
      3.0 * 56 - 144))
    // constant x -> null rho
    val const = Seq((5.0, 1L), (5.0, 2L)).toDF("x", "y")
    assert(Evaluate.spearmanExact(const, col("x"), col("y")).head.isNullAt(6))
  }

  test("calibrationBins: exact integers, clamping, derived ratios") {
    val df = Seq(
      (0.05, true), (0.07, false),        // bin 0
      (0.55, true), (0.58, true),         // bin 5
      (1.0, true),                        // exactly 1.0 clamps to bin 9
      (-0.2, false)                       // negative clamps to bin 0
    ).toDF("sc", "y")
    val out = Evaluate.calibrationBins(df, col("sc"), col("y"), nBins = 10)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(out.keySet === Set(0, 5, 9))
    val (n0, p0, s0, _, f0) = out(0)
    assert(n0 === 3L && p0 === 1L && s0 === 50000L + 70000L - 200000L)
    assert(f0 === 1.0 / 3.0)
    val (n5, p5, s5, m5, f5) = out(5)
    assert(n5 === 2L && p5 === 2L && s5 === 550000L + 580000L)
    assert(m5 === s5.toDouble / (2 * 1e6) && f5 === 1.0)
    assert(out(9)._1 === 1L && out(9)._2 === 1L)
  }

  test("null and empty texts yield zero without errors") {
    val pairs = Seq((1L, null.asInstanceOf[String], "a b"), (2L, "", "a b"),
      (3L, "a b", null.asInstanceOf[String]))
    val out = run(pairs)
    assert(out.values.forall(_.getDouble(11) === 0.0))
    assert(out(1L).getLong(1) === 0L) // null cand -> c_len 0
  }

  test("isotonicCalibrate: PAV pools violators, weighted, already-monotone") {
    // bins: b0 2/2=1.0, b5 0/1=0.0, b9 1/1=1.0 -> b0,b5 violate; pooled
    // (2+0)/(2+1)=2/3; b9 stays. Weighted: the pool is count-weighted,
    // not a mean of means.
    val df = Seq(
      (0.01, true), (0.02, true), (0.55, false), (0.95, true))
      .toDF("sc", "y")
    val out = Evaluate.isotonicCalibrate(df, col("sc"), col("y"), 10)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(out(0) === ((2L, 2L, 2L, 3L, 2.0 / 3.0)))
    assert(out(5) === ((1L, 0L, 2L, 3L, 2.0 / 3.0)))
    assert(out(9) === ((1L, 1L, 1L, 1L, 1.0)))
    // already-monotone input is untouched
    val mono = Seq((0.05, false), (0.55, true), (0.56, false), (0.95, true))
      .toDF("sc", "y")
    val out2 = Evaluate.isotonicCalibrate(mono, col("sc"), col("y"), 10)
      .collect().map(r => r.getInt(0) -> r.getDouble(5)).toMap
    assert(out2(0) === 0.0 && out2(5) === 0.5 && out2(9) === 1.0)
    // cascade: a late low bin pulls several predecessors into one block
    val casc = Seq((0.05, true), (0.15, true), (0.25, false), (0.35, false))
      .toDF("sc", "y")
    val out3 = Evaluate.isotonicCalibrate(casc, col("sc"), col("y"), 10)
      .collect().map(r => r.getInt(0) -> r.getDouble(5)).toMap
    assert(Seq(0, 1, 2, 3).forall(b => out3(b) === 0.5))
  }

  test("jackknifeMean: hand two-block case, layout invariance, one-block guard") {
    // block 0 = {10, 20}, block 1 = {30, 40}: S=100, N=4, mean 25
    // m_0 = 70/2 = 35, m_1 = 30/2 = 15 -> m_dot 25,
    // ss = 100+100 = 200, var = (1/2)*200 -> se = 10
    val df = Seq((0L, 10L), (0L, 20L), (1L, 30L), (1L, 40L)).toDF("b", "v")
    val r = Evaluate.jackknifeMean(df, col("v"), col("b")).head
    assert(r.getLong(0) == 4L && r.getLong(1) == 100L && r.getLong(2) == 2L)
    assert(r.getDouble(3) === 25.0 && r.getDouble(4) === 25.0)
    assert(r.getDouble(5) === 10.0)
    val r7 = Evaluate.jackknifeMean(df.repartition(7), col("v"), col("b")).head
    assert(r7.toSeq == r.toSeq)
    // every row in one block: no leave-one-out mean exists -> empty
    val one = Seq((3L, 5L), (3L, 7L)).toDF("b", "v")
    assert(Evaluate.jackknifeMean(one, col("v"), col("b")).count() == 0L)
  }

  test("logRank: hand hypergeometric terms, symmetric groups -> z 0, one-group null") {
    // A events at t=1,2; B events at t=3,4 (no censoring):
    // t=1: n=4 n1=2 d=1 d1=1 -> num 0.5, var 1*(.5)(.5)(3)/(3) = 0.25
    // t=2: n=3 n1=1 d=1 d1=1 -> num 2/3, var (1/3)(2/3)(2)/(2) = 2/9
    // t=3: n=2 n1=0 -> num 0, var 0;  t=4: n=1 -> var rule 0
    val df = Seq((1L, 1L, true), (2L, 1L, true), (3L, 1L, false),
      (4L, 1L, false)).toDF("t", "ev", "a")
    val r = Evaluate.logRank(df, Nil, col("t"), col("ev"), col("a")).head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L) // n1, n2
    assert(r.getLong(2) == 2L && r.getLong(3) == 4L) // o1, k_times
    assert(r.getLong(4) == 500000L + 666667L)
    assert(r.getLong(5) == 250000000L + 222222222L)
    assert(math.abs(r.getDouble(6) -
      1.166667 / math.sqrt(0.472222222)) < 1e-6)
    // mirrored groups: every time's d1 == E1 -> z == 0
    val sym = Seq((1L, 1L, true), (1L, 1L, false), (2L, 1L, true),
      (2L, 1L, false)).toDF("t", "ev", "a")
    val rs = Evaluate.logRank(sym, Nil, col("t"), col("ev"), col("a")).head
    assert(rs.getLong(4) == 0L && rs.getDouble(6) == 0.0)
    // one-sided input: z null
    val oneG = Seq((1L, 1L, true), (2L, 1L, true)).toDF("t", "ev", "a")
    assert(Evaluate.logRank(oneG, Nil, col("t"), col("ev"), col("a"))
      .head.isNullAt(6))
    // censored rows stay at risk but are not events
    val cen = Seq((1L, 1L, true), (1L, 0L, true), (2L, 1L, false),
      (3L, 0L, false)).toDF("t", "ev", "a")
    val rc = Evaluate.logRank(cen, Nil, col("t"), col("ev"), col("a")).head
    assert(rc.getLong(2) == 1L) // o1 counts only the A event
  }

  test("cmhTest: hand 2x2, balanced stratum contributes 0, opposite strata cancel") {
    // one stratum: n=10, r1=5, c1=5, n11=4:
    // num = 4 - 2.5 = 1.5, var = 625/900
    def rows(s: String, n11: Int, n10: Int, n01: Int, n00: Int) =
      Seq.fill(n11)((s, true, true)) ++ Seq.fill(n10)((s, true, false)) ++
        Seq.fill(n01)((s, false, true)) ++ Seq.fill(n00)((s, false, false))
    val one = rows("g", 4, 1, 1, 4).toDF("g", "x", "y")
    val r = Evaluate.cmhTest(one, col("g"), col("x"), col("y")).head
    assert(r.getLong(0) == 1L && r.getLong(1) == 10L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 1500000L)
    assert(r.getLong(4) == math.round(625.0 / 900.0 * 1e9))
    assert(math.abs(r.getDouble(5) - 2.25 / (625.0 / 900.0)) < 1e-6)
    // opposite association in two strata cancels the pooled num
    val two = (rows("a", 4, 1, 1, 4) ++ rows("b", 1, 4, 4, 1))
      .toDF("g", "x", "y")
    val r2 = Evaluate.cmhTest(two, col("g"), col("x"), col("y")).head
    assert(r2.getLong(0) == 2L && r2.getLong(3) == 0L &&
      r2.getDouble(6) == 0.0)
  }

  test("anovaF: hand SSB/SSW, identical groups -> F 0, constant values null") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L),
      ("b", 6L)).toDF("g", "v")
    val r = Evaluate.anovaF(df, col("g"), col("v")).head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    assert(r.getDouble(2) === 13.5 && r.getDouble(3) === 4.0)
    assert(r.getDouble(4) === 13.5) // (13.5/1)/(4/4)
    val same = Seq(("a", 1L), ("a", 3L), ("b", 1L), ("b", 3L))
      .toDF("g", "v")
    assert(Evaluate.anovaF(same, col("g"), col("v")).head.getDouble(4) == 0.0)
    val const = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L))
      .toDF("g", "v")
    assert(Evaluate.anovaF(const, col("g"), col("v")).head.isNullAt(4))
  }

  test("brownForsythe: doubled median deviations, outlier-robust, even-n median") {
    // A = [1,2,30] med 2 -> z = 2,0,56 ; B = [4,5,6] med 5 -> z = 2,0,2
    val df = Seq(("a", 1L), ("a", 2L), ("a", 30L), ("b", 4L), ("b", 5L),
      ("b", 6L)).toDF("g", "v")
    val r = Evaluate.brownForsythe(df, col("g"), col("v")).head
    // ssb = 3*(58/3 - 31/3)^2/... exact: group sums 58 and 4, n=3 each
    // sq_ppm = round(58^2/3 * 1e6) + round(16/3 * 1e6),
    // grand = round(62^2/6 * 1e6)
    val sq = math.round(58.0 * 58.0 / 3.0 * 1e6) +
      math.round(16.0 / 3.0 * 1e6)
    val grand = math.round(62.0 * 62.0 / 6.0 * 1e6)
    assert(math.abs(r.getDouble(2) - (sq - grand) / 1e6) < 1e-9)
    assert(math.abs(r.getDouble(3) - ((4 + 0 + 3136 + 4 + 0 + 4) - sq / 1e6)) < 1e-6)
    // even-n group: med2 = lower + upper middle (3 + 5 = 8 for [1,3,5,7])
    val even = Seq(("a", 1L), ("a", 3L), ("a", 5L), ("a", 7L),
      ("b", 2L), ("b", 2L)).toDF("g", "v")
    // A deviations |2v-8| = 6,2,2,6 -> sum 16; B: |2v-4| = 0,0
    val re = Evaluate.brownForsythe(even, col("g"), col("v")).head
    assert(re.getLong(1) == 6L)
    // ssw exact: A z-values 6,2,2,6: v2 = 80, s = 16 -> ssw_A = 80 - 64 = 16
    assert(math.abs(re.getDouble(3) - 16.0) < 1e-6)
  }

  test("welchT: hand t and Welch-Satterthwaite df, equal arms -> t 0, tiny arm null") {
    val df = (Seq(1L, 2L, 3L).map(v => (true, v)) ++
      Seq(7L, 9L, 11L, 13L).map(v => (false, v))).toDF("a", "v")
    val r = Evaluate.welchT(df, col("a"), col("v")).head
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L)
    assert(r.getDouble(2) === 2.0 && r.getDouble(3) === 10.0)
    assert(r.getDouble(4) === 1.0) // var1
    assert(math.abs(r.getDouble(5) - 20.0 / 3.0) < 1e-12)
    assert(math.abs(r.getDouble(6) - (-8.0 / math.sqrt(2.0))) < 1e-12)
    val a = 1.0 / 3.0; val b = (20.0 / 3.0) / 4.0
    assert(math.abs(r.getDouble(7) -
      (a + b) * (a + b) / (a * a / 2.0 + b * b / 3.0)) < 1e-12)
    val eq = Seq((true, 1L), (true, 3L), (false, 1L), (false, 3L))
      .toDF("a", "v")
    assert(Evaluate.welchT(eq, col("a"), col("v")).head.getDouble(6) == 0.0)
    val tiny = Seq((true, 1L), (false, 2L), (false, 3L)).toDF("a", "v")
    assert(Evaluate.welchT(tiny, col("a"), col("v")).head.isNullAt(6))
  }

  test("jonckheere: hand no-tie and tied cases, reversed trend flips sign, degenerate nulls") {
    // groups 1:[1,2], 2:[3,4] -- every cross pair ascends: J=4, j2=8,
    // e2=(16-8)/2=4, no ties: var = (156-36)/72 + 0 + 0 = 5/3
    val up = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L)).toDF("g", "v")
    val r = Evaluate.jonckheere(up, col("g"), col("v")).head
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 8L && r.getLong(3) == 4L)
    assert(math.abs(r.getDouble(4) - 5.0 / 3.0) < 1e-12)
    assert(math.abs(r.getDouble(5) - 2.0 / math.sqrt(5.0 / 3.0)) < 1e-12)
    // mirrored trend: j2 symmetric below e2
    val down = Seq((1L, 3L), (1L, 4L), (2L, 1L), (2L, 2L)).toDF("g", "v")
    val rd = Evaluate.jonckheere(down, col("g"), col("v")).head
    assert(rd.getLong(2) == 0L &&
      math.abs(rd.getDouble(5) + r.getDouble(5)) < 1e-12)
    // ties: 1:[1,1], 2:[1,2] -- U = 2*(0.5 + 1) = 3 -> j2 = 6;
    // var = 54/72 + 0 + 24/96 = 1.0; z = ((6-4)/2)/1 = 1
    val tied = Seq((1L, 1L), (1L, 1L), (2L, 1L), (2L, 2L)).toDF("g", "v")
    val rt = Evaluate.jonckheere(tied, col("g"), col("v")).head
    assert(rt.getLong(2) == 6L && rt.getLong(3) == 4L)
    assert(math.abs(rt.getDouble(4) - 1.0) < 1e-12)
    assert(math.abs(rt.getDouble(5) - 1.0) < 1e-12)
    // all-tied values: var 0 -> z null; single group -> z null
    val const = Seq((1L, 5L), (2L, 5L)).toDF("g", "v")
    assert(Evaluate.jonckheere(const, col("g"), col("v")).head.isNullAt(5))
    val one = Seq((1L, 1L), (1L, 2L)).toDF("g", "v")
    assert(Evaluate.jonckheere(one, col("g"), col("v")).head.isNullAt(5))
  }

  test("kendallTauB: perfect/reversed/independent, ties, constant margin null") {
    def run(pairs: Seq[(Long, Long)]) =
      Evaluate.kendallTauB(pairs.toDF("x", "y"), col("x"), col("y")).head
    val perfect = run(Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    assert(perfect.getLong(1) == 3L && perfect.getLong(2) == 0L)
    assert(perfect.getDouble(5) === 1.0 && perfect.getDouble(6) === 1.0)
    val rev = run(Seq((1L, 30L), (2L, 20L), (3L, 10L)))
    assert(rev.getDouble(5) === -1.0)
    // independent 2x2: one concordant, one discordant pair -> tau 0
    val ind = run(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))
    assert(ind.getLong(1) == 1L && ind.getLong(2) == 1L)
    assert(ind.getDouble(5) === 0.0)
    // ties on both margins: all comparable pairs concordant -> tau-b 1
    val tied = run(Seq((1L, 5L), (1L, 5L), (2L, 9L)))
    assert(tied.getLong(1) == 2L && tied.getLong(2) == 0L)
    assert(tied.getLong(3) == 2L && tied.getLong(4) == 2L)
    assert(tied.getDouble(5) === 1.0 && tied.getDouble(6) === 1.0)
    // constant x margin: dx = 0 -> null statistics
    assert(run(Seq((7L, 1L), (7L, 2L))).isNullAt(5))
  }

  test("mutualInfo: perfect dependence -> NMI 1, independence -> 0, constant margin null") {
    def run(pairs: Seq[(String, String)]) =
      Evaluate.mutualInfo(pairs.toDF("x", "y"), col("x"), col("y")).head
    val dep = run(Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b")))
    assert(dep.getLong(0) == 4L && dep.getLong(1) == 2L)
    // per cell: (1/2)ln2 -> 346573590 ppb, twice; entropies identical
    assert(dep.getLong(2) == 2L * 346573590L)
    assert(dep.getLong(3) == dep.getLong(2) && dep.getLong(4) == dep.getLong(2))
    assert(dep.getDouble(5) === 1.0)
    val ind = run(Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")))
    assert(ind.getLong(2) == 0L && ind.getDouble(5) === 0.0)
    val const = run(Seq(("a", "x"), ("a", "y")))
    assert(const.getLong(3) == 0L && const.isNullAt(5))
  }

  test("cochranQ: hand Q, incomplete blocks drop, duplicate rows rejected") {
    // 4 subjects x 3 treatments; C = 4,2,0; R = 2,1,2,1
    // num = 2*(3*20 - 36) = 48, den = 3*6 - 10 = 8, Q = 6
    val rows = for {
      s <- 1L to 4L
      (j, y) <- Seq(("t1", true), ("t2", s % 2 == 1), ("t3", false))
    } yield (s, j, y)
    val r = Evaluate.cochranQ(rows.toDF("s", "j", "y"),
      col("s"), col("j"), col("y")).head
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 48L && r.getLong(3) == 8L)
    assert(r.getDouble(4) === 6.0)
    // subject 5 misses t3 -> drops; totals unchanged except C from 1-4
    val incomplete = rows ++ Seq((5L, "t1", true), (5L, "t2", true))
    val ri = Evaluate.cochranQ(incomplete.toDF("s", "j", "y"),
      col("s"), col("j"), col("y")).head
    assert(ri.getLong(1) == 4L && ri.getLong(2) == 48L)
    val dup = rows ++ Seq((1L, "t1", false))
    assertThrows[IllegalArgumentException] {
      Evaluate.cochranQ(dup.toDF("s", "j", "y"),
        col("s"), col("j"), col("y")).head
    }
  }

  test("fleissKappa: hand kappa fraction, perfect agreement = 1, incomplete rejected") {
    // 4 subjects x 3 raters x 2 cats: n = (3,0),(0,3),(2,1),(1,2)
    // S2 = 28, C = (6,6), Pbar = 2/3, Pe = 1/2, kappa = 1/3 = 48/144
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "a"),
      (2L, 1L, "b"), (2L, 2L, "b"), (2L, 3L, "b"),
      (3L, 1L, "a"), (3L, 2L, "a"), (3L, 3L, "b"),
      (4L, 1L, "a"), (4L, 2L, "b"), (4L, 3L, "b"))
    val r = Evaluate.fleissKappa(rows.toDF("s", "r", "j"),
      col("s"), col("r"), col("j")).head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 28L)
    assert(r.getDecimal(4).longValueExact == 72L)
    assert(r.getDecimal(5).longValueExact == 48L)
    assert(r.getDecimal(6).longValueExact == 144L)
    assert(math.abs(r.getDouble(7) - 1.0 / 3.0) < 1e-15)
    // unanimous raters: kappa exactly 1
    val perfect = Evaluate.fleissKappa(rows.take(6).toDF("s", "r", "j"),
      col("s"), col("r"), col("j")).head
    assert(perfect.getDouble(7) === 1.0)
    // subject 5 rated by only two raters: loud completeness failure
    val incomplete = rows ++ Seq((5L, 1L, "a"), (5L, 2L, "a"))
    assertThrows[IllegalArgumentException] {
      Evaluate.fleissKappa(incomplete.toDF("s", "r", "j"),
        col("s"), col("r"), col("j")).head
    }
  }
}
