package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Distributed Lloyd k-means: convergence on planted blobs, layout
  * invariance, exact integer centroid means, degeneracy handling. */
class KmeansSpec extends SparkSuite {
  import spark.implicits._

  /** 3 planted blobs in 4-d: centers at 0, 10, 20 on every axis with
    * ±0.25 deterministic jitter — separation >> spread so Lloyd must
    * recover the planting from any non-degenerate init. */
  private def blobs(n: Int) = {
    val rows = (0 until n).map { i =>
      val b = i % 3
      val jit = (d: Int) => ((i * 7 + d * 13) % 11 - 5) * 0.05
      (i.toLong, b, Seq.tabulate(4)(d => (b * 10.0 + jit(d)).toFloat))
    }
    rows.toDF("id", "planted", "vec")
  }

  test("recovers planted blobs and centroids are the exact ppm means") {
    val df = blobs(300)
    val r = Ann.kmeansLloyd(df, "id", "vec", k = 3, iters = 3)
    // every cluster maps 1:1 onto a planted blob
    val purity = r.assigned.groupBy("_cell")
      .agg(countDistinct(col("planted")).as("np"), count(lit(1)).as("n"))
      .collect()
    assert(purity.length == 3 && purity.forall(_.getLong(1) == 1L))
    assert(purity.map(_.getLong(2)).sum == 300L)
    // centroid components equal the exact integer-ppm mean of members
    val cent = r.centroids.collect()
      .map(row => row.getInt(0) -> row.getSeq[Double](1)).toMap
    val members = r.assigned
      .select(col("_cell"), col("vec").cast("array<double>").as("v"))
      .collect().groupBy(_.getInt(0))
    for ((cell, rows) <- members) {
      val vs = rows.map(_.getSeq[Double](1))
      val n = vs.length
      val expect = Seq.tabulate(4) { d =>
        val s = vs.map(v => math.round(v(d) * 1e6)).sum
        val mag = (math.abs(s) * 2 + n) / (2L * n)
        (if (s < 0) -mag else mag).toDouble / 1e6
      }
      assert(cent(cell) == expect, s"cell $cell centroid mismatch")
    }
  }

  test("layout-invariant: repartitioned input yields identical output") {
    val df = blobs(200)
    val a = Ann.kmeansLloyd(df, "id", "vec", k = 3, iters = 2)
    val b = Ann.kmeansLloyd(df.repartition(13, col("planted")), "id", "vec",
      k = 3, iters = 2)
    val keyA = a.assigned.select("id", "_cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val keyB = b.assigned.select("id", "_cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(keyA == keyB)
    val cA = a.centroids.collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSet
    val cB = b.centroids.collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSet
    assert(cA == cB) // exact equality: integer sums are order-free
  }

  test("explicit init replays and ties break to the lowest cell") {
    // two identical centroids (cells 0,1 get the same single member set
    // via init on id parity over duplicate points) — argmin must pick 0
    val df = Seq(
      (0L, Seq(1.0f, 1.0f)), (1L, Seq(1.0f, 1.0f)),
      (2L, Seq(1.0f, 1.0f)), (3L, Seq(1.0f, 1.0f))
    ).toDF("id", "vec")
    val r = Ann.kmeansLloyd(df, "id", "vec", k = 2, iters = 1,
      initCell = pmod(col("id"), lit(2)))
    // both init cells have the same centroid (1,1); every doc ties and
    // must land in cell 0
    val cells = r.assigned.select("_cell").collect().map(_.getInt(0)).toSet
    assert(cells == Set(0))
  }

  test("empty cells drop out instead of crashing") {
    val df = blobs(30) // ids 0..29, k=8 with hash init: some cells empty
    val r = Ann.kmeansLloyd(df, "id", "vec", k = 8, iters = 2)
    val nCells = r.centroids.count()
    assert(nCells <= 8 && nCells >= 1)
    assert(r.assigned.count() == 30)
  }

  test("assignment plan is map-only (no join, no exchange)") {
    // a range-derived input (not a LocalRelation, which the optimizer
    // pre-evaluates into a LocalTableScan) so the assign stage is a real
    // executed projection
    val df = spark.range(100).select(col("id"),
      transform(sequence(lit(0), lit(3)),
        d => (pmod(col("id"), lit(3)) * 10.0 + d * 0.01).cast("float")).as("vec"))
    val r = Ann.kmeansLloyd(df, "id", "vec", k = 3, iters = 1)
    val plan = r.assigned.queryExecution.executedPlan.toString
    // assignment folds the driver-collected centroid table into one
    // nearest_centroid scalar: the final assign stage must carry no join
    // and no shuffle of the doc vectors
    assert(!plan.contains("Join"), s"expected no join:\n$plan")
    assert(!plan.contains("Exchange"), s"expected no exchange:\n$plan")
    // the kernel has doGenCode: the assign projection must stay inside a
    // whole-stage codegen span (the `*(n)` prefix), not fall back to
    // interpreted eval
    assert(plan.linesIterator.exists(l =>
      l.contains("nearest_centroid") && l.trim.startsWith("*(")),
      s"expected codegen'd assign projection:\n$plan")
  }

  test("nearest_centroid matches the join-based argmin bit-for-bit") {
    val df = blobs(200)
    val cents = Seq(
      Seq(0.0, 0.0, 0.1, -0.1),
      Seq(9.5, 10.5, 10.0, 9.9),
      Seq(20.0, 19.0, 20.1, 20.0))
    val cells = Seq(0, 1, 2)
    val kernel = df.withColumn("_cell",
      graft.functions.nearest_centroid(col("vec"), cells, cents))
      .select("id", "_cell")
    // reference: explicit crossJoin + min(struct(dist, cell)) argmin with
    // the identical left-fold distance
    val cdf = cells.zip(cents).toDF("_c", "_center")
    val dist = org.apache.spark.sql.functions.aggregate(
      zip_with(col("vec").cast("array<double>"), col("_center"),
        (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, x) => acc + x)
    val joined = df.crossJoin(broadcast(cdf))
      .groupBy(col("id"))
      .agg(min(struct(dist.as("_d"), col("_c"))).as("_best"))
      .select(col("id"), col("_best._c").as("_cell"))
    val a = kernel.orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    val b = joined.orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a.sameElements(b))
  }

  test("nearest_centroid nulls on dimension mismatch and null input") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f)), (3L, null.asInstanceOf[Seq[Float]])
    ).toDF("id", "vec")
    val out = df.withColumn("_cell",
        graft.functions.nearest_centroid(col("vec"), Seq(0, 1),
          Seq(Seq(0.0, 0.0), Seq(5.0, 5.0))))
      .orderBy("id").select("_cell").collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0), "dim-mismatched vector must yield null")
    assert(out(2).isNullAt(0), "null vector must yield null")
  }

  test("kCenter: greedy reference parity, min-id seed, nonincreasing selection distances") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val pts = (0L until 80L).map(i =>
      (i, Seq.fill(6)(rnd.nextDouble() * 2 - 1)))
    def ref(k: Int): Seq[(Int, Long, Double)] = {
      def d2(a: Seq[Double], b: Seq[Double]) =
        a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + (x - y) * (x - y) }
      var centers = Vector(pts.minBy(_._1))
      var out = Vector((1, centers(0)._1, 0.0))
      for (i <- 2 to k) {
        val far = pts.map(p =>
            (p, centers.map(c => d2(p._2, c._2)).min))
          .minBy { case (p, d) => (-d, p._1) }
        centers :+= far._1
        out :+= ((i, far._1._1, far._2))
      }
      out
    }
    val got = Ann.kCenter(pts.toDF("id", "v").repartition(5), "id", "v", 6)
      .orderBy("sel_order").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == ref(6))
    assert(got.head._2 == 0L) // min-id seed
    // selection distances nonincreasing after the seed
    val ds = got.drop(1).map(_._3)
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
    // k = 1 is just the seed
    val one = Ann.kCenter(pts.toDF("id", "v"), "id", "v", 1).collect()
    assert(one.length == 1 && one(0).getLong(1) == 0L)
    // n < k stops early with each point selected once, no duplicates
    val tiny = pts.take(3).toDF("id", "v")
    val t3 = Ann.kCenter(tiny, "id", "v", 5).collect()
      .map(_.getLong(1)).toSeq
    assert(t3.length == 3 && t3.distinct.length == 3)
  }
}
