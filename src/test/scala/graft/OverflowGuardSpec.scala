package graft

import org.apache.spark.sql.functions._

import graft.operators.Evaluate

/** r7 decimal-overflow audit guards: the exact-arithmetic aggregations
  * must be provably in-range or refuse LOUDLY — Spark nulls Decimal
  * overflow with ansi=false, and a null that coalesces downstream reads
  * as a statistic (w1=0 "no drift", r=null "no correlation"), the
  * silent-wrong-answer class. */
class OverflowGuardSpec extends SparkSuite {
  import spark.implicits._

  test("correlationMatrix refuses |x| > 2^31 loudly, accepts the bound") {
    val ok = Seq((2147483647L, 1L), (-2147483647L, 2L), (5L, 3L))
      .toDF("a", "b")
    assert(Evaluate.correlationMatrix(ok, Seq("a", "b")).count() == 1)
    val bad = Seq((2147483648L, 1L), (0L, 2L)).toDF("a", "b")
    val e = intercept[Exception] {
      Evaluate.correlationMatrix(bad, Seq("a", "b")).collect()
    }
    assert(e.getMessage.contains("correlationMatrix needs |a| <= 2^31"))
  }

  test("w1Test2 stays exact with near-2^62 values (decimal cum math)") {
    val big = 1L << 62
    val a = Seq(0L, big).toDF("v")
    val b = Seq(0L, big).toDF("v")
    // identical distributions -> w1 = 0 even with a 2^62 gap in play
    val same = Evaluate.w1Test2(a, b, col("v")).head
    assert(same.getAs[java.math.BigDecimal]("w1_num").longValueExact == 0L)
    // point masses 0 vs big: w1_num = n1*n2*gap = 1*1*2^62 exactly
    val pm = Evaluate.w1Test2(Seq(0L).toDF("v"), Seq(big).toDF("v"),
      col("v")).head
    assert(pm.getAs[java.math.BigDecimal]("w1_num").longValueExact == big)
  }

  test("logLoss sum is decimal-backed and emits a guarded long") {
    val df = Seq((0.5, true), (0.000001, true), (0.999999, false))
      .toDF("p", "y")
    val r = Evaluate.logLoss(df, col("p"), col("y")).head
    assert(r.schema("loss_ppb_sum").dataType ==
      org.apache.spark.sql.types.LongType)
    // 0.5 -> ln2*1e9; the two clamped rows -> ln(1e6)*1e9 each
    val want = math.round(math.log(2.0) * 1e9) +
      2L * math.round(-math.log(1e-6) * 1e9)
    assert(math.abs(r.getAs[Long]("loss_ppb_sum") - want) <= 2L)
  }
}
