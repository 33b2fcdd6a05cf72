package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{GroupOps, Pack}

class PackPiiSpec extends SparkSuite {
  import spark.implicits._

  test("chunkTokens: overlapping windows tile the token stream") {
    val df = Seq(
      (0L, "a b c d e f g"),    // 7 tokens, window 3 overlap 1 -> starts 0,2,4,6
      (1L, "x y"),              // short doc -> one chunk
      (2L, "")                  // no tokens -> no rows
    ).toDF("id", "text")
    val got = Pack.chunkTokens(df, "id", col("text"), window = 3, overlap = 1)
      .orderBy("id", "chunk_idx").collect()
    val rows = got.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getInt(3), r.getString(4)))
    assert(rows.toSeq == Seq(
      (0L, 0, 0L, 3, "a b c"), (0L, 1, 2L, 3, "c d e"),
      (0L, 2, 4L, 3, "e f g"), (0L, 3, 6L, 1, "g"),
      (1L, 0, 0L, 2, "x y")))
    // overlap=0 partitions the stream exactly
    val flat = Pack.chunkTokens(df, "id", col("text"), window = 3)
      .where(col("id") === 0).orderBy("chunk_idx")
      .select("chunk_text").collect().map(_.getString(0))
    assert(flat.toSeq == Seq("a b c", "d e f", "g"))
  }

  test("packBlocks equals the naive window cumsum for random counts") {
    val rng = new scala.util.Random(42)
    val df = (0L until 500L).map(i => (i, rng.nextInt(40).toLong))
      .toDF("id", "nt")
    val got = Pack.packBlocks(df, "id", "nt", blockSize = 64)
      .orderBy("id").collect()
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    val want = df
      .withColumn("start_off", coalesce(sum("nt").over(w), lit(0L)))
      .orderBy("id").collect()
    got.zip(want).foreach { case (g, e) =>
      assert(g.getLong(0) == e.getLong(0))
      val start = e.getLong(2)
      val n = e.getLong(1)
      assert(g.getLong(2) == start, s"start_off of id ${g.getLong(0)}")
      assert(g.getLong(3) == start / 64)
      val lastWant = if (n > 0) (start + n - 1) / 64 else start / 64
      assert(g.getLong(4) == lastWant)
    }
  }

  test("packBlocks is invariant under input partitioning and order") {
    val df = (0L until 300L).map(i => (i, (i * 7 % 23) + 1)).toDF("id", "nt")
    val a = Pack.packBlocks(df.repartition(17), "id", "nt", 32)
      .orderBy("id").collect().toSeq
    val b = Pack.packBlocks(df.orderBy(desc("id")).coalesce(1), "id", "nt", 32)
      .orderBy("id").collect().toSeq
    assert(a == b)
    // stream is contiguous: each start_off = previous start_off + n
    a.sliding(2).foreach { case Seq(p, q) =>
      assert(q.getLong(2) == p.getLong(2) + p.getLong(1))
    }
  }

  test("pii counts and redaction on crafted strings") {
    val df = Seq(
      (0L, "reach me at a.b-c%d@sub.example.co.uk or 192.168.0.1 today"),
      (1L, "no pii here at all"),
      (2L, "two mails x@y.io z@w.de one ip 10.0.0.255"),
      (3L, "not-an-ip 1234.5.6.7 still matches inner 234.5.6.7"),
      (4L, "email at end x@y.com")
    ).toDF("id", "text")
    val got = df.select(col("id"),
      TextFunctions.emailCount(col("text")).as("ne"),
      TextFunctions.ipv4Count(col("text")).as("ni"),
      TextFunctions.redactPii(col("text")).as("red"))
      .orderBy("id").collect()
    assert(got(0).getInt(1) == 1 && got(0).getInt(2) == 1)
    assert(got(0).getString(3) == "reach me at <EMAIL> or <IP> today")
    assert(got(1).getInt(1) == 0 && got(1).getInt(2) == 0)
    assert(got(1).getString(3) == "no pii here at all")
    assert(got(2).getInt(1) == 2 && got(2).getInt(2) == 1)
    // "1234.5.6.7" yields no match: the first octet would need \b before
    // a 1-3 digit run followed by '.', and every candidate start inside
    // "1234" sits between digits (no boundary). Only the standalone
    // "234.5.6.7" token counts.
    assert(got(3).getInt(2) == 1)
    assert(got(4).getInt(1) == 1)
    assert(got(4).getString(3) == "email at end <EMAIL>")
  }

  test("stratified sample caps each group at k, deterministically") {
    val df = (0L until 200L).map(i => (i, s"lang${i % 3}")).toDF("id", "lang")
    val a = GroupOps.sampleStratified(df, 5, 99L, col("lang"), col("id"))
      .orderBy("id").collect().toSeq
    val b = GroupOps.sampleStratified(df.repartition(13), 5, 99L,
      col("lang"), col("id")).orderBy("id").collect().toSeq
    assert(a == b)
    val perGroup = a.groupBy(_.getString(1)).view.mapValues(_.size).toMap
    assert(perGroup.values.toSet == Set(5))
    // different seed draws a different sample
    val c = GroupOps.sampleStratified(df, 5, 100L, col("lang"), col("id"))
      .orderBy("id").collect().toSeq
    assert(a != c)
  }

  test("poolVectors: exact ppm means/maxes, ragged dims, layout invariance") {
    val df = Seq(
      ("a", Array(1.0f, -2.0f, 0.5f)),
      ("a", Array(2.0f, -1.0f)), // ragged: dim 2 pools over one row
      ("b", Array(10.0f, 10.0f, 10.0f))
    ).toDF("g", "v")
    val out = GroupOps.poolVectors(df, Seq("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(("a", 0)) === ((2L, 1500000L, 2000000L)))
    // mean of -2e6 and -1e6 ppm: round-half-away((3e6*2+2) div 4) = -1500000
    assert(out(("a", 1)) === ((2L, -1500000L, -1000000L)))
    assert(out(("a", 2)) === ((1L, 500000L, 500000L)))
    assert(out(("b", 0)) === ((1L, 10000000L, 10000000L)))
    val rep = GroupOps.poolVectors(df.repartition(5), Seq("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rep === out)
  }

  test("sequenceExamples: in-order bounded context, pos>1, per-key isolation") {
    val ev = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"), (1L, 40L, "d"),
      (1L, 50L, "e"),
      (2L, 10L, "x"), (2L, 20L, "y")
    ).toDF("u", "t", "item")
    val out = Pack.sequenceExamples(ev, "u", Seq(col("t")), col("item"), 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getSeq[String](2), r.getString(3))).toMap
    assert(out((1L, 2)) === ((Seq("a"), "b")))
    assert(out((1L, 4)) === ((Seq("a", "b", "c"), "d")))
    // context caps at 3 and slides (drops "a")
    assert(out((1L, 5)) === ((Seq("b", "c", "d"), "e")))
    // keys never leak into each other; first position emits nothing
    assert(out((2L, 2)) === ((Seq("x"), "y")))
    assert(!out.contains((1L, 1)) && !out.contains((2L, 1)))
    assert(out.size === 5)
  }

  test("redact_cards: Luhn gate, maximal-run length rule, stats") {
    import graft.functions.{card_run_stats, redact_cards}
    val valid16 = "4539578763621486" // passes Luhn
    val invalid16 = "4539578763621487"
    val valid13 = "4222222222222"
    val cases = Seq(
      (1L, s"pay $valid16 now"), // redacted
      (2L, s"pay $invalid16 now"), // candidate, checksum fails
      (3L, s"id 123456789012 x"), // 12 digits: not a candidate
      (4L, s"sn 45395787636214860000 x"), // 20 digits: not a candidate
      (5L, s"a $valid16 b $valid13 c"), // two redactions in one row
      (6L, "no digits at all"))
    val out = cases.toDF("id", "t")
      .select(col("id"), redact_cards(col("t")).as("r"),
        card_run_stats(col("t")).as("s"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getStruct(2).getInt(0), r.getStruct(2).getInt(1))))
      .toMap
    assert(out(1L) === (("pay [CARD] now", 1, 1)))
    assert(out(2L) === ((s"pay $invalid16 now", 1, 0)))
    assert(out(3L) === (("id 123456789012 x", 0, 0)))
    assert(out(4L) === (("sn 45395787636214860000 x", 0, 0)))
    assert(out(5L) === (("a [CARD] b [CARD] c", 2, 2)))
    assert(out(6L) === (("no digits at all", 0, 0)))
  }

  test("redact_cards: run at string boundaries and checksum parity") {
    import graft.functions.redact_cards
    // the check digit is the rightmost: appending one digit flips the
    // doubling parity of every digit — both directions exercised
    val r = Seq((1L, "4539578763621486"), (2L, "04539578763621486"))
      .toDF("id", "t")
      .select(col("id"), redact_cards(col("t")).as("r"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) === "[CARD]") // whole string is the run
    // 17-digit run with leading 0: doubling parity shifts; 0 prefix
    // keeps the sum's mod-10 value (0 doubled is 0) -> still valid
    assert(r(2L) === "[CARD]")
  }

  test("centroidPairs: exact integer dot/norms, identical/orthogonal groups, dim mismatch drops") {
    val df = Seq(
      ("a", Array(1.0f, 0.0f)), ("a", Array(1.0f, 0.0f)),
      ("b", Array(0.0f, 2.0f)),
      ("c", Array(1.0f, 0.0f)),
      ("d", Array(1.0f, 1.0f, 1.0f)) // wrong dim -> no pairs with a/b/c
    ).toDF("g", "v")
    val out = GroupOps.centroidPairs(df, "g", col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)), r.getDouble(5))).toMap
    // centroids: a=(1e6,0), b=(0,2e6), c=(1e6,0)
    assert(out(("a", "b"))._1 === ((0L, 1000000000000L, 4000000000000L)))
    assert(out(("a", "b"))._2 === 0.0) // orthogonal -> exactly 0
    val ((dac, naac, ncc), cosac) = out(("a", "c"))
    assert(dac === 1000000000000L && naac === dac && ncc === dac)
    assert(math.abs(cosac - 1.0) < 1e-12) // identical, up to sqrt ulp
    assert(!out.keySet.exists(p => p._1 == "d" || p._2 == "d"))
    assert(out.size === 3) // (a,b) (a,c) (b,c)
  }

  test("conformal: exact rank selection, r>n infinity, tie handling") {
    import graft.operators.Evaluate
    def df(vs: Seq[Long]) = vs.toDF("s").repartition(3)
    // n=9, alpha=1/10 -> r = ceil(10*0.9) = 9 -> thr = 9
    val r1 = Evaluate.conformal(df(1L to 9L), df(Seq(5L, 9L, 10L)),
      col("s"), 1, 10).head
    assert(r1.getLong(0) === 9L && r1.getLong(1) === 9L)
    assert(r1.getLong(2) === 9L)
    assert(r1.getLong(3) === 3L && r1.getLong(4) === 2L)
    assert(r1.getDouble(5) === 2.0 / 3.0)
    // r > n -> infinite threshold (null), everything covered
    val r2 = Evaluate.conformal(df(Seq(1L, 2L)), df(Seq(100L)),
      col("s"), 1, 10).head
    assert(r2.getLong(1) === 3L && r2.isNullAt(2))
    assert(r2.getLong(4) === 1L && r2.getDouble(5) === 1.0)
    // ties: the r-th smallest VALUE is well-defined
    val r3 = Evaluate.conformal(df(Seq(5L, 5L, 5L, 1L)), df(Seq(5L, 6L)),
      col("s"), 1, 2).head
    assert(r3.getLong(1) === 3L && r3.getLong(2) === 5L)
    assert(r3.getLong(4) === 1L)
  }
}
