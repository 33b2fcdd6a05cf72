package graft

import org.apache.spark.sql.functions._

import graft.operators.Funnel
import graft.functions.substring_count_all

/** r7 additions: gap sessionization, SymSpell correction, multi-pattern
  * substring counts — hand cases + layout invariance. */
class SessionHitsSpec extends SparkSuite {
  import spark.implicits._

  test("sessionize: gap strictly-greater rule, per-user indexing") {
    val g = 100L
    val ev = Seq(
      // user 1: gaps 100 (stays), 101 (new), 50 (stays)
      (1L, 0L, "a"), (1L, 100L, "b"), (1L, 201L, "a"), (1L, 251L, "a"),
      // user 2: single event
      (2L, 7L, "z")).toDF("u", "ts", "t")
    val out = Funnel.sessionize(ev, "u", "ts", "t", g)
      .orderBy("user", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (1L, 1L, 2L, 0L, 100L, 100L, 2L),   // a,b — 2 types
      (1L, 2L, 2L, 201L, 251L, 50L, 1L),  // a,a — 1 type
      (2L, 1L, 1L, 7L, 7L, 0L, 1L)))
    // layout invariance
    val out7 = Funnel.sessionize(ev.repartition(7), "u", "ts", "t", g)
      .orderBy("user", "session_idx").collect()
    assert(out7.length == 3)
    // undated events drop rather than gluing onto a session
    val withNull = ev.unionByName(
      Seq((1L, null.asInstanceOf[java.lang.Long], "x"))
        .toDF("u", "ts", "t").select(col("u"), col("ts").cast("long"),
          col("t")))
    assert(Funnel.sessionize(withNull, "u", "ts", "t", g)
      .agg(sum("n_events")).head.getLong(0) == 5L)
  }

  test("substring_count_all: non-overlapping replace convention") {
    val df = Seq("aaaa banana aa", "no hits here", null)
      .toDF("t")
    val out = df.select(substring_count_all(col("t"),
        Seq("aa", "ana", "banana")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0))
    // "aaaa" -> aa,aa = 2; " aa" tail -> 1 more = 3 total
    // "ana": banana has ana at 1 (non-overlap -> skip to 4) = 1
    assert(out(0) == Seq(3L, 1L, 1L))
    assert(out(1) == Seq(0L, 0L, 0L))
    assert(out(2) == null)
  }

  test("spellCorrect: deletion-neighborhood completeness for edit <= 1") {
    import graft.operators.TextSearch
    val vocab = Seq(("spark", 100L), ("spars", 40L), ("stark", 60L),
      ("shark", 60L), ("a", 5L), ("b", 3L), ("query", 10L))
      .toDF("word", "freq")
    val toks = Seq("spark", "sparkk", "spak", "sprak", "qq", "a", "c")
      .toDF("t")
    val out = TextSearch.spellCorrect(toks, "t", vocab, "word", "freq")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getInt(2), r.getLong(3))).toMap
    assert(out("spark") == ("spark", 0, 100L))  // exact self-match wins
    assert(out("sparkk") == ("spark", 1, 100L)) // insertion
    assert(out("spak") == ("spark", 1, 100L))   // deletion; freq beats spars
    assert(!out.contains("sprak")) // transposition = levenshtein 2: absent
    assert(!out.contains("qq"))    // nothing within 1
    assert(out("a") == ("a", 0, 5L))
    assert(out("c") == ("a", 1, 5L)) // 1-char sub via the "" key; freq pick
  }

  test("spellCorrect equals the quadratic levenshtein join") {
    import graft.operators.TextSearch
    val words = Seq("cat", "cart", "card", "care", "scat", "hat", "chat",
      "coat", "cast", "cut", "bat", "batch", "match", "other")
    val vocab = words.zipWithIndex.map { case (w, i) => (w, (i + 1).toLong) }
      .toDF("word", "freq")
    val toks = Seq("cat", "cas", "mat", "xx", "coats", "batc").toDF("t")
    val got = TextSearch.spellCorrect(toks, "t", vocab, "word", "freq")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    // quadratic reference in plain scala
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val freqs = words.zipWithIndex.map { case (w, i) => w -> (i + 1L) }.toMap
    val want = Seq("cat", "cas", "mat", "xx", "coats", "batc").flatMap { t =>
      val cand = words.map(w => (w, lev(t, w))).filter(_._2 <= 1)
      if (cand.isEmpty) None
      else Some {
        val best = cand.minBy { case (w, d) => (d, -freqs(w), w) }
        (t, best._1, best._2)
      }
    }.toSet
    assert(got == want)
  }

  test("delete1Pairs equals the quadratic edit-1 pair set") {
    import graft.operators.Dedup
    val strs = Seq("cat", "cats", "bat", "bats", "cast", "act", "cat",
      "dog", "dig", "dg", "d", "e", "xyzzy")
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    val got = Dedup.delete1Pairs(df, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      i <- strs.indices; j <- strs.indices if i < j
      d = lev(strs(i), strs(j)) if d <= 1
    } yield (i.toLong, j.toLong, d)).toSet
    assert(got == want)
    // the dist-0 exact-dup pair ("cat" twice) is in the set
    assert(got.contains((0L, 6L, 0)))
    // "act" vs "cat" is a transposition = levenshtein 2: absent
    assert(!got.exists(p => Set(p._1, p._2) == Set(0L, 5L)))
  }

  test("substring_count_all matches the replace-length arithmetic") {
    val pats = Seq("ab", "aba")
    val texts = Seq("ababab", "aabbaab", "abaabaaba")
    val got = texts.toDF("t")
      .select(col("t"), substring_count_all(col("t"), pats).as("c"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    for (t <- texts; (p, i) <- pats.zipWithIndex) {
      val want = (t.length - t.replace(p, "").length) / p.length
      assert(got(t)(i) == want, s"$t / $p")
    }
  }
}
