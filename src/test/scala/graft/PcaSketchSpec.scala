package graft

import org.apache.spark.sql.functions._

import graft.operators.{Jacobi, Pca, Sketch}

class PcaSketchSpec extends SparkSuite {
  import spark.implicits._

  // ---------- Jacobi (driver-side eigensolve) ----------

  test("jacobi matches analytic eigenvalues of a known symmetric matrix") {
    // [[2,1],[1,2]] → eigenvalues 3 and 1, eigenvectors (1,1)/√2, (1,-1)/√2
    val (vals, vecs) = Jacobi.eigSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    // columns orthonormal
    val dot01 = vecs(0)(0) * vecs(0)(1) + vecs(1)(0) * vecs(1)(1)
    assert(math.abs(dot01) < 1e-12)
    val n0 = vecs(0)(0) * vecs(0)(0) + vecs(1)(0) * vecs(1)(0)
    assert(math.abs(n0 - 1.0) < 1e-12)
  }

  test("jacobi reconstructs A = V diag(w) V^T") {
    val a = Array(
      Array(4.0, 1.0, -2.0),
      Array(1.0, 2.0, 0.5),
      Array(-2.0, 0.5, 3.0))
    val (w, v) = Jacobi.eigSym(a)
    for (i <- 0 until 3; j <- 0 until 3) {
      val r = (0 until 3).map(k => w(k) * v(i)(k) * v(j)(k)).sum
      assert(math.abs(r - a(i)(j)) < 1e-10, s"($i,$j): $r vs ${a(i)(j)}")
    }
  }

  // ---------- co-moments ----------

  private def vecsDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("id", "v")

  test("comoments equals a local brute-force computation") {
    val data = Seq(
      1L -> Seq(0.1f, -0.2f, 0.3f),
      2L -> Seq(0.4f, 0.0f, -0.1f),
      3L -> Seq(-0.3f, 0.25f, 0.05f),
      4L -> Seq(0.2f, 0.2f, 0.2f))
    val df = vecsDf(data)
    val out = Pca.comoments(df, "v", 3).orderBy("i", "j").collect()
    val q = data.map { case (_, v) => v.map(x => math.round(x.toDouble * 10000)) }
    var idx = 0
    for (i <- 0 until 3; j <- i until 3) {
      val r = out(idx)
      assert(r.getInt(0) == i && r.getInt(1) == j)
      assert(r.getLong(2) == data.length)
      assert(r.getLong(3) == q.map(_(i)).sum, s"sxi($i)")
      assert(r.getLong(4) == q.map(_(j)).sum, s"sxj($j)")
      assert(r.getLong(5) == q.map(v => v(i) * v(j)).sum, s"sxy($i,$j)")
      idx += 1
    }
  }

  test("comoments skips dimension-mismatched rows and is layout-invariant") {
    val good = Seq(1L -> Seq(0.5f, 0.5f), 2L -> Seq(-0.5f, 0.25f),
      3L -> Seq(0.125f, -0.25f))
    val bad = Seq(4L -> Seq(0.1f), 5L -> Seq.empty[Float])
    val df = vecsDf(good ++ bad)
    val a = Pca.comoments(df, "v", 2).orderBy("i", "j").collect()
    assert(a.forall(_.getLong(2) == good.length))
    val b = Pca.comoments(df.repartition(7), "v", 2).orderBy("i", "j").collect()
    assert(a.map(_.toSeq.toList).toList == b.map(_.toSeq.toList).toList)
  }

  test("comoments plan partially aggregates (map-side combine before the shuffle)") {
    val df = vecsDf(Seq(1L -> Seq(0.1f, 0.2f), 2L -> Seq(0.3f, 0.4f)))
      .repartition(4)
    val plan = Pca.comoments(df, "v", 2).queryExecution.executedPlan.toString
    assert(plan.contains("partial_co_moments"),
      s"no partial aggregation in plan:\n$plan")
  }

  // ---------- fit ----------

  test("correlationPairs: perfect +1/-1 correlations exact; null rows skipped whole") {
    import spark.implicits._
    // y = 2x (r = +1), z = -x (r = -1); one row with a null y drops
    // entirely from every pair (common-support rule)
    val df = Seq(
      (1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.0, -4.0)
    ).toDF("x", "y", "z")
      .unionByName(Seq((99.0, Option.empty[Double], -99.0))
        .toDF("x", "y", "z"))
    val got = Pca.correlationPairs(df, Seq(
        "x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.get(4)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got.values.forall(_._1 == 4L)) // the null row never counted
    assert(got(("x", "y"))._2.contains(1.0))
    assert(got(("x", "z"))._2.contains(-1.0))
    assert(got(("y", "z"))._2.contains(-1.0))
    assert(got(("x", "x"))._2.contains(1.0))
  }

  test("correlationPairs: zero-variance signal yields null corr, exact cov") {
    import spark.implicits._
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("a", "c")
    val got = Pca.correlationPairs(df, Seq("a" -> col("a"), "c" -> col("c")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ac = got(("a", "c"))
    assert(ac.getLong(3) == 0L)   // cov_num exact zero
    assert(ac.isNullAt(4))        // constant signal -> undefined r
  }

  test("pca recovers a planted 2D subspace and orders by variance") {
    // x = a·u + b·w + tiny noise in d=6; u, w orthogonal; var(a) >> var(b)
    val d = 6
    val u = Array(1.0, 1.0, 0.0, 0.0, 1.0, -1.0).map(_ / 2.0)
    val w = Array(1.0, -1.0, 1.0, -1.0, 0.0, 0.0).map(_ / 2.0)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      val a = (rnd.nextDouble() - 0.5) * 1.6   // sd ~0.46
      val b = (rnd.nextDouble() - 0.5) * 0.4   // sd ~0.12
      val noise = Array.fill(d)((rnd.nextDouble() - 0.5) * 0.002)
      (i.toLong, (0 until d).map(j => (a * u(j) + b * w(j) + noise(j)).toFloat))
    }
    val df = rows.toDF("id", "v")
    val m = Pca.fit(df, "v", 2)
    assert(m.dims == d && m.outDim == 2)
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    // top-2 components span {u, w}: each planted axis reconstructs from the basis
    def residual(t: Array[Double]): Double = {
      val p0 = (0 until d).map(j => t(j) * m.components(0)(j)).sum
      val p1 = (0 until d).map(j => t(j) * m.components(1)(j)).sum
      val rec = (0 until d).map(j => p0 * m.components(0)(j) + p1 * m.components(1)(j))
      math.sqrt((0 until d).map(j => { val e = t(j) - rec(j); e * e }).sum)
    }
    assert(residual(u) < 0.02, s"u residual ${residual(u)}")
    assert(residual(w) < 0.02, s"w residual ${residual(w)}")
    // explained variance: the planted subspace carries ~all of it
    assert(m.explainedVarianceRatio.sum > 0.99)
    // components orthonormal
    val n0 = m.components(0).map(x => x * x).sum
    val dot = (0 until d).map(j => m.components(0)(j) * m.components(1)(j)).sum
    assert(math.abs(n0 - 1.0) < 1e-9 && math.abs(dot) < 1e-9)
  }

  test("pca fit is bitwise layout-invariant") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map(i =>
      (i.toLong, Seq.fill(4)((rnd.nextDouble() - 0.5).toFloat)))
    val df = rows.toDF("id", "v")
    val m1 = Pca.fit(df, "v", 3)
    val m2 = Pca.fit(df.repartition(13), "v", 3)
    assert(m1.mean.toSeq == m2.mean.toSeq)
    assert(m1.components.map(_.toSeq).toSeq == m2.components.map(_.toSeq).toSeq)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
  }

  test("project expression matches a manual dot product and nulls on bad dims") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 50).map(i =>
      (i.toLong, Seq.fill(4)((rnd.nextDouble() - 0.5).toFloat)))
    val df = rows.toDF("id", "v")
    val m = Pca.fit(df, "v", 2)
    val got = df.select(col("id"), m.project(col("v")).as("p"))
      .orderBy("id").collect()
    rows.zip(got).foreach { case ((_, v), r) =>
      val p = r.getSeq[Double](1)
      for (k <- 0 until 2) {
        val exp = (0 until 4).map(j => m.components(k)(j) * (v(j) - m.mean(j))).sum
        assert(math.abs(p(k) - exp) < 1e-9)
      }
    }
    // wrong dimensionality → null, not a wrong projection
    val badRow = Seq((99L, Seq(0.1f))).toDF("id", "v")
      .select(m.project(col("v")).as("p")).head
    assert(badRow.isNullAt(0))
  }

  test("projected variance matches the eigenvalue (decorrelated output)") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 500).map(i =>
      (i.toLong, Seq.fill(3)((rnd.nextDouble() - 0.5).toFloat)))
    val df = rows.toDF("id", "v")
    val m = Pca.fit(df, "v", 3)
    val ps = df.select(m.project(col("v")).as("p")).collect().map(_.getSeq[Double](0))
    for (k <- 0 until 3) {
      val xs = ps.map(_(k))
      val mu = xs.sum / xs.length
      val v = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      // the eigenvalue lives on the 1e-4 quantized grid; the projection
      // runs on raw floats — agreement is to quantization order, not ulp
      assert(math.abs(v - m.eigenvalues(k)) < 1e-5, s"axis $k: $v vs ${m.eigenvalues(k)}")
    }
    // cross-covariance ~0 between axes
    val mu0 = ps.map(_(0)).sum / ps.length
    val mu1 = ps.map(_(1)).sum / ps.length
    val c01 = ps.map(p => (p(0) - mu0) * (p(1) - mu1)).sum / ps.length
    assert(math.abs(c01) < 1e-5) // quantization-order agreement, not ulp
  }

  // ---------- grid-blocked 2-D pairs ----------

  test("gridPairs2d equals brute force — complete blocking at any cell width ≥ r") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(13)
    val pts = (0 until 300).map(i =>
      (i.toLong, rnd.nextDouble() * 2 - 1, rnd.nextDouble() * 2 - 1))
    val df = pts.toDF("id", "x", "y").repartition(5)
    val r = 0.07
    def key(row: org.apache.spark.sql.Row) = (row.getLong(0), row.getLong(1))
    val got = Dedup.gridPairs2d(df, "id", "x", "y", r).collect()
      .map(rw => key(rw) -> rw.getDouble(2)).toMap
    val want = (for {
      (a, xa, ya) <- pts; (b, xb, yb) <- pts if a < b
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if d2 <= r * r
    } yield (a, b) -> d2).toMap
    assert(got == want) // recall 1 AND exact distances
    assert(want.nonEmpty)
    // wider cells are still complete
    val got2 = Dedup.gridPairs2d(df, "id", "x", "y", r, cellW = 0.25)
      .collect().map(rw => key(rw) -> rw.getDouble(2)).toMap
    assert(got2 == want)
    // cells narrower than the radius would lose pairs — refused loudly
    intercept[IllegalArgumentException] {
      Dedup.gridPairs2d(df, "id", "x", "y", r, cellW = 0.05)
    }
  }

  test("gridPairs2d plans as a cell-keyed equi-join, never a cross product") {
    import graft.operators.Dedup
    val df = (0 until 100).map(i => (i.toLong, i * 0.01, i * 0.02)).toDF("id", "x", "y")
    val plan = Dedup.gridPairs2d(df, "id", "x", "y", 0.05)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"cross product in plan:\n$plan")
  }

  test("gridPairs2d maxCell valve drops only hot-cell points") {
    import graft.operators.Dedup
    // 50 points piled into one cell + 2 isolated near neighbors elsewhere
    val hot = (0 until 50).map(i => (i.toLong, 0.001 * i, 0.001 * i))
    val pair = Seq((100L, 5.0, 5.0), (101L, 5.001, 5.001))
    val df = (hot ++ pair).toDF("id", "x", "y")
    val out = Dedup.gridPairs2d(df, "id", "x", "y", radius = 0.1, maxCell = 10)
      .collect().map(rw => (rw.getLong(0), rw.getLong(1))).toSet
    assert(out == Set((100L, 101L))) // hot cell dropped, the quiet pair kept
  }

  // ---------- KMV sketch ----------

  test("kmv reports exact counts below k and estimates above with bounded error") {
    val rows = (0 until 5000).map(i => (s"g${i % 2}", s"key-${i / 2}")) ++
      (0 until 10).map(i => ("small", s"s$i"))
    val df = rows.toDF("g", "key")
    val out = Sketch.kmvDistinctStrings(df, Seq("g"), col("key"), k = 128)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out("small") == ((10L, 10L)))  // exact branch
    for (g <- Seq("g0", "g1")) {
      val (kAct, est) = out(g)
      assert(kAct == 128L)
      val truth = 2500.0
      assert(math.abs(est - truth) / truth < 0.30, s"$g est=$est")  // ~3/√k ≈ 0.27
    }
  }

  test("kmv sketches merge losslessly (whole == union of halves)") {
    val all = (0 until 3000).map(i => ("g", s"key-$i"))
    val (h1, h2) = all.splitAt(1500)
    val overlap = h1.take(300)  // shared keys across the halves
    val k = 64
    val whole = Sketch.kmvSketch(all.toDF("g", "key"), Seq("g"),
      Sketch.keyHash(col("key")), k).collect()(0).getSeq[Long](1)
    val s1 = Sketch.kmvSketch(h1.toDF("g", "key"), Seq("g"),
      Sketch.keyHash(col("key")), k)
    val s2 = Sketch.kmvSketch((h2 ++ overlap).toDF("g", "key"), Seq("g"),
      Sketch.keyHash(col("key")), k)
    val merged = Sketch.kmvMerge(s1.union(s2), Seq("g"), k)
    val mergedArr = merged.collect()(0).getSeq[Long](1)
    assert(mergedArr == whole)
    // estimate column works over the artifact
    val est = merged.select(Sketch.kmvEstimateFromSketch(col("kmv"), k)).head.getLong(0)
    assert(math.abs(est - 3000.0) / 3000.0 < 0.45)
  }

  test("kmvJaccard estimates planted overlap; exact at the extremes") {
    val k = 256
    def sketchOf(keys: Seq[String]) = Sketch.kmvSketch(
      keys.map(("g", _)).toDF("g", "key"), Seq("g"),
      Sketch.keyHash(col("key")), k)
    val shared = (0 until 1000).map(i => s"s$i")
    val onlyA = (0 until 1000).map(i => s"a$i")
    val onlyB = (0 until 1000).map(i => s"b$i")
    val sa = sketchOf(shared ++ onlyA).withColumnRenamed("kmv", "ka")
    val sb = sketchOf(shared ++ onlyB).withColumnRenamed("kmv", "kb")
    val j = sa.join(sb, "g")
      .select(Sketch.kmvJaccard(col("ka"), col("kb"), k)).head.getDouble(0)
    assert(math.abs(j - 1.0 / 3.0) < 0.12, s"jaccard $j vs 1/3") // ±~3σ at k=256
    // identical sketches → exactly 1; disjoint → exactly 0
    val same = sa.select(Sketch.kmvJaccard(col("ka"), col("ka"), k)).head.getDouble(0)
    assert(same == 1.0)
    val da = sketchOf(onlyA).withColumnRenamed("kmv", "ka")
    val db = sketchOf(onlyB).withColumnRenamed("kmv", "kb")
    val none = da.crossJoin(db)
      .select(Sketch.kmvJaccard(col("ka"), col("kb"), k)).head.getDouble(0)
    assert(none == 0.0)
    // pairwise driver over a 3-group sketch table
    val tri = Sketch.kmvSketch(
      (shared.map(("x", _)) ++ shared.map(("y", _)) ++ onlyB.map(("z", _)))
        .toDF("g", "key"), Seq("g"), Sketch.keyHash(col("key")), k)
    val pairs = Sketch.kmvOverlapPairs(tri, "g", k)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(pairs(("x", "y")) == 1.0 && pairs(("x", "z")) == 0.0 &&
      pairs(("y", "z")) == 0.0)
  }

  test("kmv estimate is the exact integer floor-division formula") {
    // unsigned(h) = 2^63 → est = (k-1)·2^64 / 2^63 = 2(k-1)
    assert(graft.functions.KmvEstimate.compute(Long.MinValue, 5) == 8L)
    assert(graft.functions.KmvEstimate.compute(0L, 7) == 0L)
    // h = 1 (tiny kth min) → clamped to Long.MaxValue
    assert(graft.functions.KmvEstimate.compute(1L, 2) == Long.MaxValue)
  }

  test("kmv sketch plan is ONE partially-aggregated pass — no distinct, no window") {
    val df = (0 until 1000).map(i => (s"g${i % 3}", s"k$i")).toDF("g", "key")
      .repartition(4)
    val plan = Sketch.kmvSketch(df, Seq("g"), Sketch.keyHash(col("key")), 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_kmv_sketch"),
      s"no map-side combine in plan:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in plan:\n$plan")
    // one group-keyed exchange above the repartition (dedup lives IN the
    // buffer, so there's no second distinct shuffle)
    assert("Exchange hashpartitioning\\(g".r.findAllIn(plan).length == 1,
      s"expected exactly one group-keyed exchange:\n$plan")
  }

  test("kmv sketch agg equals the explicit distinct+sort formulation") {
    val rows = (0 until 4000).map(i => (s"g${i % 2}", s"key-${i % 700}"))
    val df = rows.toDF("g", "key").repartition(7)
    val got = Sketch.kmvSketch(df, Seq("g"), Sketch.keyHash(col("key")), 32)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // reference: hash per distinct key, sort unsigned, take 32
    val want = rows.distinct.map { case (g, key) =>
      g -> graft.functions.Fnv64.mix(graft.functions.Fnv64.hashString(
        org.apache.spark.unsafe.types.UTF8String.fromString(key)))
    }.groupBy(_._1).view.mapValues(
      _.map(_._2).distinct.sortBy(h => h ^ Long.MinValue).take(32).toSeq).toMap
    assert(got == want)
  }
}
