package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

/** r7 additions, tenth wave: seeded-Laplace DP group counts —
  * mechanism shape, determinism, clamp, key gate. */
class DpSpec extends SparkSuite {
  import spark.implicits._

  test("dpNoisyCounts: deterministic, zero-clamped, scale tracks 1/eps") {
    val df = spark.range(100000).select(
      pmod(col("id"), lit(200)).as("k"))
    val one = Quality.dpNoisyCounts(df, col("k"), epsilonPpm = 500000L,
      seed = 7L).collect()
    val two = Quality.dpNoisyCounts(df.repartition(9), col("k"),
      epsilonPpm = 500000L, seed = 7L).collect()
    assert(one.map(_.toSeq).toSet == two.map(_.toSeq).toSet)
    assert(one.forall(_.getAs[Long]("noisy_n") >= 0L))
    // Laplace(b=2): mean |noise| should be near b = 2; loose band
    val meanAbs = one.map(r => math.abs(r.getAs[Long]("noise")))
      .sum.toDouble / one.length
    assert(meanAbs > 0.5 && meanAbs < 6.0, s"meanAbs=$meanAbs")
    // smaller epsilon -> bigger noise
    val loose = Quality.dpNoisyCounts(df, col("k"), epsilonPpm = 50000L,
      seed = 7L).collect()
    val meanAbsLoose = loose.map(r => math.abs(r.getAs[Long]("noise")))
      .sum.toDouble / loose.length
    assert(meanAbsLoose > 5 * meanAbs / 2, s"$meanAbsLoose vs $meanAbs")
  }

  test("dpNoisyCounts: different seeds decorrelate; negative key refuses") {
    val df = spark.range(10000).select(pmod(col("id"), lit(50)).as("k"))
    val a = Quality.dpNoisyCounts(df, col("k"), 500000L, seed = 1L)
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("noise"))
      .toMap
    val b = Quality.dpNoisyCounts(df, col("k"), 500000L, seed = 2L)
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("noise"))
      .toMap
    assert(a.keys.count(k => a(k) != b(k)) > 25)
    intercept[Exception] {
      Quality.dpNoisyCounts(Seq(-1L).toDF("k"), col("k"), 500000L)
        .collect()
    }
  }
}
