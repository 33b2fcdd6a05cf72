package graft

import org.apache.spark.sql.functions._

import graft.operators.{GroupOps, Quality}

/** Winsorization bounds/clamp and the column profile diff. */
class WinsorProfileSpec extends SparkSuite {
  import spark.implicits._

  test("winsorize hand case: exact ceil-rank bounds and clamping") {
    // group g: values 1..10 -> p10 target ceil(10/10)=1 -> lo = 1st = 1;
    // p80 target ceil(8)=8 -> hi = 8. Outliers clamp to [1, 8].
    val df = ((1 to 10).map(v => ("g", v.toLong)) :+ ("g", 100L) :+ ("g", -5L))
      .toDF("grp", "v")
    // sorted: -5,1,2,...,10,100 (12 values)
    // lo target ceil(12/10) = 2 -> 2nd smallest = 1
    // hi target ceil(12*8/10) = 10 -> 10th smallest = 9
    val out = GroupOps.winsorize(df, Seq("grp"), col("v"), 1, 10, 8, 10)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(100L) === ((1L, 9L, 9L)))
    assert(out(-5L) === ((1L, 9L, 1L)))
    assert(out(5L) === ((1L, 9L, 5L)))
  }

  test("winsorize full-range bounds are the group min/max") {
    val df = Seq(("a", 3L), ("a", 7L), ("a", 9L)).toDF("grp", "v")
    val r = GroupOps.winsorize(df, Seq("grp"), col("v"), 0, 1, 1, 1)
      .select("lo", "hi").distinct().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 9L)
  }

  test("profileDiff: exact stats, change flags, null handling") {
    val oldDf = Seq((1L, Some("x")), (2L, Some("y")), (3L, None))
      .toDF("id", "s")
    val newDf = Seq((1L, Some("x")), (5L, Some("x"))).toDF("id", "s")
    val out = Quality.profileDiff(oldDf, newDf, Seq("id", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val idRow = out("id")
    assert(idRow.getLong(1) === 3L && idRow.getLong(6) === 2L)   // n
    assert(idRow.getLong(3) === 3L && idRow.getLong(8) === 2L)   // distinct
    assert(idRow.getString(4) === "1" && idRow.getString(10) === "5") // min/max
    assert(idRow.getBoolean(11) && idRow.getBoolean(12))
    val sRow = out("s")
    assert(sRow.getLong(2) === 1L && sRow.getLong(7) === 0L)     // nulls
    assert(sRow.getLong(3) === 2L && sRow.getLong(8) === 1L)
    // old range x..y vs new x..x -> changed; distinct 2 -> 1 -> changed
    assert(sRow.getBoolean(11) && sRow.getBoolean(12))
  }
}
