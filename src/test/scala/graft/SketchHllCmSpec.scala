package graft

import org.apache.spark.sql.functions._

import graft.functions.Fnv64
import graft.operators.{Ann, Sketch}

/** HyperLogLog / count-min / log-histogram sketches and the centroid
  * silhouette: register-level exactness against a Scala-side replay of
  * the hash math, estimator error bounds, lossless merges, and the
  * never-undercount CM guarantee. */
class SketchHllCmSpec extends SparkSuite {
  import spark.implicits._

  // Scala-side replay of keyHash = mix(fnv(key) + seed)
  private def keyHashLocal(s: String, seed: Long = 0L): Long =
    Fnv64.mix(Fnv64.hashString(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)) + seed)

  test("hll registers match a local replay of bucket/rho math") {
    val keys = (0 until 500).map(i => s"key$i")
    val df = keys.toDF("w").withColumn("g", lit(1))
    val p = 8
    val regs = Sketch.hllRegisters(df, Seq("g"), Sketch.keyHash(col("w")), p)
      .collect().map(r => (r.getInt(1), r.getInt(2))).toMap

    val expected = scala.collection.mutable.Map[Int, Int]()
    keys.foreach { k =>
      val h = keyHashLocal(k)
      val bucket = (h >>> (64 - p)).toInt
      val rem = h & ((1L << (64 - p)) - 1)
      val rho = if (rem == 0L) 64 - p + 1
        else 64 - p + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      expected(bucket) = math.max(expected.getOrElse(bucket, 0), rho)
    }
    assert(regs === expected.toMap)
  }

  test("hll estimate lands within 10% at 20k distinct and is exact-ish small") {
    val big = (0 until 20000).map(i => s"u$i").toDF("w").withColumn("g", lit("b"))
    val out = Sketch.hllDistinctStrings(big, Seq("g"), col("w"), p = 8)
      .select("est_hll").head.getDouble(0)
    // σ ≈ 1.04/√256 = 6.5%; allow ~2.5σ (registers are replay-exact above)
    assert(math.abs(out - 20000) < 3300, s"est $out")

    // small cardinality → linear-counting branch, tight
    val small = (0 until 40).map(i => s"v$i").toDF("w").withColumn("g", lit("s"))
    val est = Sketch.hllDistinctStrings(small, Seq("g"), col("w"), p = 8)
      .select("est_hll").head.getDouble(0)
    assert(math.abs(est - 40) < 5, s"est $est")
  }

  test("hllSketch agg equals hllRegisters densified") {
    val df = (0 until 2000).map(i => s"k${i % 700}").toDF("w")
      .withColumn("g", (length(col("w")) % 2).cast("int"))
    val p = 8
    val dense = Sketch.hllSketch(df, Seq("g"), Sketch.keyHash(col("w")), p)
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    val sparse = Sketch.hllRegisters(df, Seq("g"), Sketch.keyHash(col("w")), p)
      .collect().groupBy(_.getInt(0))
      .view.mapValues(_.map(r => r.getInt(1) -> r.getInt(2)).toMap).toMap
    for ((g, regs) <- dense) {
      val want = (0 until (1 << p)).map(b => sparse(g).getOrElse(b, 0))
      assert(regs === want, s"group $g")
    }
  }

  test("hll sketches merge losslessly (union == element-wise max)") {
    val h1 = (0 until 3000).map(i => s"a$i")
    val h2 = (1500 until 4500).map(i => s"a$i")
    def sk(xs: Seq[String]) = Sketch.hllSketch(
      xs.toDF("w").withColumn("g", lit(1)), Seq("g"),
      Sketch.keyHash(col("w")), p = 8)
    val whole = sk((h1 ++ h2).distinct).select("hll").head.getSeq[Int](0)
    val merged = Sketch.hllMerge(sk(h1).union(sk(h2)), Seq("g"))
      .select("hll").head.getSeq[Int](0)
    assert(whole === merged)
  }

  test("cm estimates never undercount and are exact without collisions") {
    val rows = Seq.fill(100)("hot") ++ (0 until 50).map(i => s"cold$i")
    val df = rows.toDF("w")
    val sketch = Sketch.cmSketch(df, col("w"), depth = 4, width = 1024)
    val probes = (Seq("hot", "cold0", "cold49", "absent")).toDF("w")
    val est = Sketch.cmEstimate(sketch, probes, "w", depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("hot") >= 100)
    assert(est("cold0") >= 1 && est("cold49") >= 1)
    // 51 distinct keys in 4×1024 buckets: collisions are essentially
    // impossible per row, and min-over-4 removes any stragglers
    assert(est("hot") === 100 && est("cold0") === 1 && est("absent") === 0)
  }

  test("cm sketch cells are exact counter sums (sum of cells = depth*N)") {
    val df = (0 until 1000).map(i => s"k${i % 97}").toDF("w")
    val sketch = Sketch.cmSketch(df, col("w"), depth = 4, width = 256)
    val total = sketch.agg(sum("cell")).head.getLong(0)
    assert(total === 4L * 1000)
  }

  test("logBin is monotone, exact below 2^subBits, and bounds contain values") {
    val vals = (0L until 16L) ++ Seq(16L, 17L, 31L, 32L, 100L, 1000L, 123456L,
      (1L << 40) + 12345L)
    val df = vals.toDF("v")
    val out = df.select(col("v"), Sketch.logBin(col("v"), 4).as("bin"))
      .withColumn("lo", Sketch.logBinLo(col("bin"), 4))
      .withColumn("hi", Sketch.logBinHi(col("bin"), 4))
      .collect()
    out.foreach { r =>
      val (v, bin, lo, hi) = (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))
      assert(lo <= v && v < hi, s"v=$v bin=$bin lo=$lo hi=$hi")
      if (v < 16) assert(bin === v.toInt && lo === v && hi === v + 1)
    }
    val bins = out.sortBy(_.getLong(0)).map(_.getInt(1))
    assert(bins === bins.sorted)
  }

  test("histQuantiles brackets the exact quantile value") {
    val rnd = new scala.util.Random(7)
    val vals = (0 until 5000).map(_ => math.abs(rnd.nextLong()) % 100000L)
    val df = vals.toDF("v").withColumn("g", lit(1))
    val hist = Sketch.logHistogram(df, Seq("g"), col("v"))
    val out = Sketch.histQuantiles(hist, Seq("g"),
        Seq((1, 2), (9, 10), (99, 100)))
      .collect().map(r => ((r.getInt(1), r.getInt(2)),
        (r.getLong(3), r.getLong(5), r.getLong(6)))).toMap
    val sorted = vals.sorted
    out.foreach { case ((num, den), (target, lo, hi)) =>
      assert(target === (5000L * num + den - 1) / den)
      val exact = sorted((target - 1).toInt)
      assert(lo <= exact && exact < hi,
        s"q=$num/$den exact=$exact not in [$lo,$hi)")
    }
  }

  test("hist merge equals whole-data histogram") {
    val a = (0 until 700).map(i => (i % 50).toLong).toDF("v").withColumn("g", lit(1))
    val b = (0 until 300).map(i => (i % 90).toLong * 7).toDF("v").withColumn("g", lit(1))
    val whole = Sketch.logHistogram(a.union(b), Seq("g"), col("v"))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    val merged = Sketch.histMerge(
        Sketch.logHistogram(a, Seq("g"), col("v"))
          .union(Sketch.logHistogram(b, Seq("g"), col("v"))), Seq("g"))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(whole === merged)
  }

  test("plan shapes: hll one exchange, cm broadcast lookup, silhouette map-only") {
    val df = (0 until 500).map(i => (s"g${i % 2}", s"k$i")).toDF("g", "w")
      .repartition(5)
    // hllSketch: ONE group-keyed exchange, partial agg, no Window
    val hp = Sketch.hllSketch(df, Seq("g"), Sketch.keyHash(col("w")), 8)
      .queryExecution.executedPlan.toString
    assert(hp.contains("partial_hll_sketch"),
      s"no map-side combine in plan:\n$hp")
    assert(!hp.contains("Window"), s"unexpected window:\n$hp")
    assert("Exchange hashpartitioning\\(g".r.findAllIn(hp).length == 1,
      s"expected exactly one group-keyed exchange:\n$hp")

    // cmEstimate: the sketch side rides a broadcast join
    val sk = Sketch.cmSketch(df, col("w"), depth = 4, width = 256)
    val cp = Sketch.cmEstimate(sk, df.select("w"), "w", 4, 256)
      .queryExecution.executedPlan.toString
    assert(cp.contains("BroadcastHashJoin"), s"no broadcast lookup:\n$cp")

    // silhouette scoring stage: map-only — no exchange anywhere
    val docs = (0 until 50).map(i => (i.toLong, Array(i.toFloat, 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(0.0, 0.0)), (1, Seq(10.0, 10.0)))
      .toDF("_cell", "_center")
    val sp = graft.operators.Ann.silhouetteCentroid(docs, "embedding", cents)
      .queryExecution.executedPlan.toString
    assert(!sp.contains("Exchange"), s"silhouette should be map-only:\n$sp")
  }

  test("centroid silhouette: separated clusters score high, cell = argmin") {
    // two tight clusters far apart in 4-d
    val docs = ((0 until 20).map(i => (i.toLong, Array(0.0f, 0.0f, 0.0f, i * 0.01f))) ++
      (0 until 20).map(i => (100L + i, Array(10.0f, 10.0f, 10.0f, i * 0.01f))))
      .toDF("vec_id", "embedding")
    val r = Ann.kmeansLloyd(docs, "vec_id", "embedding", k = 2, iters = 2,
      initCell = (col("vec_id") >= 100).cast("int"))
    val sil = Ann.silhouetteCentroid(docs, "embedding", r.centroids)
    val rows = sil.select("vec_id", "_cell", "_sil").collect()
    // assignment agrees with the Lloyd kernel
    val lloydCells = r.assigned.select("vec_id", "_cell").collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    rows.foreach { x =>
      assert(x.getInt(1) === lloydCells(x.getLong(0)))
      assert(x.getDouble(2) > 0.99, s"sil ${x.getDouble(2)}")
    }
    val by = Ann.silhouetteByCluster(docs, "embedding", r.centroids).collect()
    assert(by.length === 2)
    by.foreach { x =>
      assert(x.getLong(1) === 20L)
      assert(x.getDouble(3) > 0.99)
      // mean is exactly sum/(n·1e6)
      assert(x.getDouble(3) === x.getLong(2).toDouble / (x.getLong(1) * 1e6))
    }
  }

  test("silhouette hand-check: point equidistant from both centroids scores 0") {
    val cents = Seq((0, Seq(0.0, 0.0)), (1, Seq(2.0, 0.0)))
      .toDF("_cell", "_center")
    val docs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.1f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Ann.silhouetteCentroid(docs, "embedding", cents)
      .select("vec_id", "_cell", "_sil").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(out(1L)._2 === 0.0) // d1 = d2 = 1
    assert(out(1L)._1 === 0)   // tie -> lowest cell
    // p2 is near c0; replay the exact doubles (0.1f widens inexactly)
    val (c2, s2) = out(2L)
    assert(c2 === 0)
    val x = 0.1f.toDouble
    val a = x * x; val b = (x - 2.0) * (x - 2.0)
    assert(s2 === (b - a) / b)
  }

  test("heavyHitters: exact vs brute force under real MG pruning, layout-invariant") {
    // 5 hot keys (800 each) over a 10k-unique tail: cap = k*cf = 40
    // counters per partition << 10005 distinct, so the MG decrement
    // step actually fires; the verified output must still be exact.
    val k = 20 // N = 14000 -> threshold count > 700; hot keys at 800 pass
    val tail = (0 until 10000).map(i => s"tail$i")
    val hot2 = (0 until 5).flatMap(h => Seq.fill(800)(s"hot$h"))
    val data2 = new scala.util.Random(7).shuffle(hot2 ++ tail)
    val n2 = data2.length.toLong // 14000; N/k = 700 < 800
    val out = Sketch.heavyHitters(data2.toDF("w").repartition(7), col("w"), k,
        candidateFactor = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val expect = data2.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 * k > n2).keys.toSeq.sorted
    assert(out.map(_._1).toSeq == expect)
    assert(out.forall { case (kk, c, n) =>
      c == data2.count(_ == kk).toLong && n == n2 })
    // layout invariance of the exact output
    val out1 = Sketch.heavyHitters(data2.toDF("w").repartition(1), col("w"), k,
        candidateFactor = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(out1.toSeq == out.toSeq)
  }

  test("heavyHitters: strict integer threshold cnt*k > N") {
    // 4 keys x 25 each: N=100, k=4 -> threshold cnt > 25 -> none pass
    val df = (0 until 4).flatMap(i => Seq.fill(25)(s"k$i")).toDF("w")
    assert(Sketch.heavyHitters(df, col("w"), 4).count() == 0L)
    // one key at 26 of 101 passes 26*4 > 101
    val df2 = ((0 until 4).flatMap(i => Seq.fill(25)(s"k$i")) :+ "k0").toDF("w")
    val out = Sketch.heavyHitters(df2, col("w"), 4).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("k0"))
    assert(out.head.getLong(1) == 26L && out.head.getLong(2) == 101L)
  }
}
