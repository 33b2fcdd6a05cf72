package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order clustering: bit interleave semantics + the layout payoff
  * (per-file value locality in EVERY clustered dimension). */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("zvalue interleaves bits (col0 even positions, col1 odd)") {
    val df = Seq((2L, 1L), (3L, 3L), (0L, 0L), (63L, 0L)).toDF("a", "b")
      .select(ZOrder.zvalue(6, col("a"), col("b")).as("z"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(6L, 15L, 0L, 1365L)) // 63 -> 0b010101010101
  }

  test("withZValue min/max scaling is exact on full-range ints") {
    // a spans exactly [0, 63] so 6-bit scaling is the identity
    val df = Seq((0L, 5L), (63L, 5L), (32L, 5L)).toDF("a", "b")
    val z = ZOrder.withZValue(df, 6, "a", "b")
      .select(col("a"), col("_z")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // b is constant -> span 0 -> scaled 0 -> z = spread(a) only
    assert(z(0L) == 0L)
    assert(z(63L) == 1365L)
    assert(z(32L) == (1L << 10)) // bit 5 of a -> position 10
  }

  test("wide-range columns (epoch-microsecond scale) do not overflow") {
    // spans ~1e15 ≈ 2^50: the unshifted ×65535 product would wrap a long
    val base = 1700000000000000L
    val half = 500000000000000L
    val df = Seq(
      (0L, base, base + 2 * half),        // t at min, u at max
      (1L, base + half, base + half),     // both mid
      (2L, base + 2 * half, base)         // t at max, u at min
    ).toDF("id", "t", "u")
    val z = ZOrder.withZValue(df, 16, "t", "u")
      .select(col("id"), col("_z")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(z.values.forall(_ >= 0L), s"negative z: $z")
    // exact interleaves of the scaled extremes/midpoints:
    // t rides even bit positions, u odd
    assert(z(0L) == 0xAAAAAAAAL, s"$z")            // (0, 65535)
    assert(z(1L) == (1L << 30) - 1, s"$z")         // (32767, 32767)
    assert(z(2L) == 0x55555555L, s"$z")            // (65535, 0)
  }

  test("z-ordered layout bounds per-file spread in BOTH dimensions") {
    val grid = (for (a <- 0 until 64; b <- 0 until 64)
      yield (a.toLong * 64 + b, a.toLong, b.toLong))
      .toDF("id", "a", "b")
    val zDir = java.nio.file.Files.createTempDirectory("graftz").toString
    val linDir = java.nio.file.Files.createTempDirectory("graftlin").toString
    ZOrder.writeZOrdered(grid, zDir, nFiles = 16, bits = 6, "a", "b")
    grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(linDir)

    def spreads(path: String): (Double, Double) = {
      val row = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .agg(avg("sa"), avg("sb")).head
      (row.getDouble(0), row.getDouble(1))
    }
    val (za, zb) = spreads(zDir)
    val (_, linB) = spreads(linDir)
    // a contiguous z-range covers a compact block: both dims stay local
    assert(za < 32 && zb < 32, s"z spreads ($za, $zb)")
    // a linear sort clusters only its own key; the other dim spans fully
    assert(linB > 56, s"linear b spread $linB")
    assert(zb < linB / 2)
  }

  test("hilbert: canonical 2x2 U-walk, bijective, ALWAYS-adjacent steps (the z-curve is not)") {
    import graft.functions.Hilbert
    // the base curve: (0,0) -> (0,1) -> (1,1) -> (1,0)
    assert(Hilbert.xy2d(1, 0, 0) == 0L && Hilbert.xy2d(1, 0, 1) == 1L)
    assert(Hilbert.xy2d(1, 1, 1) == 2L && Hilbert.xy2d(1, 1, 0) == 3L)
    // bits=4 full 16x16 grid: bijection onto 0..255 and the defining
    // locality property — EVERY consecutive index pair is Manhattan-
    // adjacent. The z-curve violates it at every power-of-two seam.
    val cells = for (x <- 0 until 16; y <- 0 until 16)
      yield (x, y, Hilbert.xy2d(4, x, y))
    assert(cells.map(_._3).sorted == (0L until 256L))
    val walk = cells.sortBy(_._3)
    val steps = walk.sliding(2).map { case Seq((x1, y1, _), (x2, y2, _)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) }.toSeq
    assert(steps.forall(_ == 1), s"non-adjacent hilbert steps: ${steps.count(_ != 1)}")
    def zxy(b: Int, x: Long, y: Long): Long = // morton for contrast
      (0 until b).map(i => (((x >> i) & 1) << (2 * i)) |
        (((y >> i) & 1) << (2 * i + 1))).reduce(_ | _)
    val zwalk = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield (x, y, zxy(4, x, y))).sortBy(_._3)
    val zbad = zwalk.sliding(2).count { case Seq((x1, y1, _), (x2, y2, _)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) != 1 }
    assert(zbad > 0)
    // column API == the reference walk; inputs masked into range
    val df = Seq((3L, 7L), (19L, 7L)).toDF("x", "y") // 19 masks to 3
    val got = df.select(ZOrder.hvalue(4, col("x"), col("y")))
      .collect().map(_.getLong(0))
    assert(got(0) == Hilbert.xy2d(4, 3, 7) && got(1) == got(0))
  }

  test("hilbert2 is SQL-registered and matches the column API") {
    graft.functions.registerAll(spark)
    val r = spark.sql("SELECT hilbert2(5, 9, 4)").head.getLong(0)
    assert(r == graft.functions.Hilbert.xy2d(4, 5, 9))
  }

  test("rowGroupStats: footer stats cover the data exactly; sorted layout = disjoint ranges") {
    import graft.operators.ScanStats
    val dir = java.nio.file.Files.createTempDirectory("graft-rgstats").toString
    spark.range(50000L).select(col("id").as("k"), (col("id") * 7).as("v"))
      .coalesce(1).sortWithinPartitions("k")
      .write.mode("overwrite")
      .option("parquet.block.size", 65536)
      .option("parquet.page.size", 8192)
      .parquet(dir)
    val st = ScanStats.rowGroupStats(spark, dir, Seq("k"))
      .orderBy(col("min_v").cast("long")).collect()
    assert(st.length > 1, "expected multiple row groups at this block size")
    assert(st.map(_.getLong(3)).sum == 50000L)
    assert(st.head.getString(4).toLong == 0L &&
      st.last.getString(5).toLong == 49999L)
    // sorted unique key: consecutive groups strictly disjoint — the
    // prunable shape the audit exists to surface
    st.sliding(2).foreach { case Array(a, b) =>
      assert(a.getString(5).toLong < b.getString(4).toLong)
    }
    // column filter: only the requested column's chunks are returned
    assert(st.forall(_.getString(2) == "k"))
  }
}
