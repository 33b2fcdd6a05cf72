package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{LangModel, Quality}

/** Corpus cleaning rule batteries (C4 / Gopher) and PMI collocations. */
class QualitySpec extends SparkSuite {
  import spark.implicits._

  test("c4Clean applies every published line and document rule") {
    val good = "one two three four five.\nsix seven eight nine ten!\n" +
      "is this a kept question line?"
    val docs = Seq(
      // 3 clean lines -> kept verbatim
      (0L, good),
      // short line, no-punct line, javascript line all drop -> 1 kept < 3
      (1L, "too short.\nno terminal punct here at all\n" +
        "we use JavaScript on this page.\nonly this line has legs to stand."),
      // lorem ipsum nukes the doc even with 3 good lines
      (2L, good + "\nLorem Ipsum dolor sit amet forever."),
      // a brace anywhere nukes the doc
      (3L, good + "\nvar x = { a: 1 };"),
      // blank lines are not lines; quote counts as terminal punctuation
      (4L, "\n\nhe said \"this line ends in a quote\"\n" +
        "one two three four five.\nsix seven eight nine ten?")
    ).toDF("id", "t")
    val r = Quality.c4Clean(docs, col("t")).orderBy("id")
      .select("n_lines", "n_kept", "keep", "kept_text").collect()
    assert(r(0).getInt(0) == 3 && r(0).getInt(1) == 3 && r(0).getBoolean(2))
    assert(r(0).getString(3) == good)
    assert(r(1).getInt(1) == 1 && !r(1).getBoolean(2) && r(1).getString(3) == "")
    assert(r(2).getInt(1) == 4 && !r(2).getBoolean(2)) // lorem line itself passes the line rules
    assert(!r(3).getBoolean(2))
    assert(r(4).getInt(0) == 3 && r(4).getInt(1) == 3 && r(4).getBoolean(2))
  }

  test("gopherQuality: each rule cuts on its own axis") {
    val base = "the quick brown fox jumps over the lazy dog and that " +
      "is why we keep this document around for the test of quality rules"
    val docs = Seq(
      (0L, base), // passes with the tuned-down minWords below
      (1L, "way too short"), // word-count floor
      (2L, "zz " * 30 + "the of"), // top-word dominance
      (3L, "0 1 2 3 4 5 6 7 8 9 " * 3 + "the of and that be"), // alpha frac
      (4L, Seq.fill(24)("assorted distinct words here").mkString(" ")
        .split(" ").zipWithIndex.map { case (w, i) => w + i }.mkString(" "))
      // ^ 96 distinct words, no required stopword
    ).toDF("id", "t")
    val r = Quality.gopherQuality(docs, col("t"), minWords = 20,
      maxTopWordFrac = 0.2).orderBy("id").collect()
    def b(row: org.apache.spark.sql.Row, name: String): Boolean =
      row.getBoolean(row.fieldIndex(name))
    assert(b(r(0), "keep"))
    assert(!b(r(1), "ok_words") && !b(r(1), "keep"))
    assert(!b(r(2), "ok_top_word") && !b(r(2), "keep"))
    assert(!b(r(3), "ok_alpha") && !b(r(3), "keep"))
    assert(!b(r(4), "ok_stopwords") && !b(r(4), "keep"))
  }

  test("gopherQuality line rules: bullets, ellipsis, duplicate lines") {
    val bullety = (1 to 10).map(i => s"- bullet item $i").mkString("\n")
    val ellipsisy = (1 to 10).map(i => s"thought number $i trails off...")
      .mkString("\n")
    val dupey = ("same line of text\n" * 8) + "one other line"
    val docs = Seq((0L, bullety), (1L, ellipsisy), (2L, dupey)).toDF("id", "t")
    // relax the word rules so only the line rules decide
    val r = Quality.gopherQuality(docs, col("t"), minWords = 1,
      minDistinctStopwords = 0, maxTopWordFrac = 1.0, maxTopBigramFrac = 1.0,
      minMeanWordLen = 0.0).orderBy("id").collect()
    def b(row: org.apache.spark.sql.Row, name: String): Boolean =
      row.getBoolean(row.fieldIndex(name))
    assert(!b(r(0), "ok_bullets") && b(r(1), "ok_bullets"))
    assert(!b(r(1), "ok_ellipsis") && b(r(0), "ok_ellipsis"))
    assert(!b(r(2), "ok_dup_lines") && b(r(0), "ok_dup_lines"))
  }

  test("alphaWordFrac and distinctStopwordCount") {
    val r = Seq(Tuple1("the 42 cats eat 7 fish"))
      .toDF("t").select(
        TextFunctions.alphaWordFrac(col("t")).as("a"),
        TextFunctions.distinctStopwordCount(col("t"),
          Seq("the", "and", "fish")).as("s"))
      .head
    assert(math.abs(r.getDouble(0) - 4.0 / 6.0) < 1e-12)
    assert(r.getInt(1) == 2) // the, fish
  }

  test("collocations ranks glued pairs above independent ones, exact ppm") {
    // "tick tock" always adjacent; filler words shuffled independently
    val docs = (0 until 40).map { i =>
      val filler = Seq("aa", "bb", "cc", "dd").map(w => w + " " + w)
      (i.toLong, s"tick tock ${filler((i * 7) % 4)} tick tock aa bb cc dd")
    }.toDF("id", "t")
    val r = LangModel.collocations(docs, col("t"), minCount = 5, topK = 5)
      .collect()
    assert(r.head.getString(0) == "tick" && r.head.getString(1) == "tock")
    // exact integer replay of the head row: floor(n12 * N * 1e6 / (n1*n2))
    val n12 = r.head.getLong(2); val n1 = r.head.getLong(3)
    val n2 = r.head.getLong(4); val ppm = r.head.getLong(5)
    val nTok = 40L * 10L
    assert(ppm == n12 * nTok * 1000000L / (n1 * n2))
    assert(ppm > 1000000L) // well above independence
  }

  test("collocations is deterministically ordered and honors minCount") {
    val docs = Seq((0L, "x y " * 6 + "rare pair")).toDF("id", "t")
    val r = LangModel.collocations(docs, col("t"), minCount = 5, topK = 10)
      .collect()
    // only "x y" and "y x" recur >= 5 times ("rare pair" occurs once)
    assert(r.map(x => (x.getString(0), x.getString(1))).toSeq ==
      Seq(("x", "y"), ("y", "x")) ||
      r.map(x => (x.getString(0), x.getString(1))).toSeq ==
        Seq(("y", "x"), ("x", "y")))
    assert(r.forall(_.getLong(2) >= 5))
    val ppms = r.map(_.getLong(5)).toSeq
    assert(ppms == ppms.sortBy(-_))
  }

  test("aHash: block sums and threshold bits, hand-checked") {
    import graft.operators.Multimodal
    // 2x2 image, grid=2 -> 1x1 blocks; gray sums = r+g+b per pixel
    val vals = Seq(
      10f, 10f, 10f, // (0,0) sum 30
      0f, 0f, 0f, // (0,1) sum 0
      90f, 0f, 0f, // (1,0) sum 90
      0f, 0f, 0f) // (1,1) sum 0
    val df = Seq(Tuple1(vals)).toDF("v")
      .withColumn("b", Multimodal.grayBlockSums(col("v"), 2, 2, grid = 2))
      .withColumn("h", Multimodal.aHashFromBlocks(col("b")))
    val r = df.head
    assert(r.getSeq[Long](1) == Seq(30L, 0L, 90L, 0L))
    // total 120, mean 30: bits (30*4>120)=0, 0, (90*4>120)=1, 0 -> MSB-first 0b0010
    assert(r.getLong(2) == 2L)
  }

  test("hammingPairs64 equals brute force at the pigeonhole radius") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 120).map { i => (i.toLong, rnd.nextLong()) }
    // plant a hamming-3 neighbor for the first 12 signatures
    val planted = rows ++ rows.take(12).map { case (id, s) =>
      (id + 1000L, s ^ 0x0000000000010101L) // flip 3 bits
    }
    val df = planted.toDF("id", "sig")
    val got = graft.operators.Dedup.hammingPairs64(df, "id", "sig",
      maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (a, sa) <- planted; (b, sb) <- planted if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(got == want && want.size >= 12)
  }

  test("frameEnergies: exact int16 squares through the real WAV codec") {
    import graft.operators.Multimodal
    // 8 samples, 2 frames of 4: loud first frame, quiet second
    val ints = Seq(1000, -1000, 2000, -500, 10, -10, 5, 0)
    val pcm = ints.map(v => v / 32768.0f)
    val df = Seq(Tuple1(pcm)).toDF("pcm")
      .withColumn("wav", Multimodal.encodeWav(col("pcm"), array(lit(8)), lit(8000)))
      .withColumn("back", Multimodal.decodeWav(col("wav")))
      .withColumn("e", Multimodal.frameEnergies(col("back.values"), 2, 4))
      .withColumn("fp", Multimodal.aHashFromBlocks(col("e")))
    val r = df.head
    val e0 = ints.take(4).map(v => v.toLong * v).sum
    val e1 = ints.drop(4).map(v => v.toLong * v).sum
    assert(r.getSeq[Long](3) == Seq(e0, e1))
    // frame 0 above the mean, frame 1 below -> bits 10 -> MSB-first 0b10
    assert(r.getLong(4) == 2L)
  }

  test("withImagePhash nulls failed decodes; corrupt blobs pair with nothing") {
    import graft.operators.Multimodal
    val px = (0 until 768).map(i => (i * 7 % 256).toFloat)
    val withBlob = Seq(Tuple1(px)).toDF("v")
      .select(Multimodal.encodeImage(col("v"),
        array(lit(16), lit(16), lit(3)), lit("png")).as("blob"))
      .head.getAs[Array[Byte]](0)
    val docs = Seq(
      ("good1", withBlob), ("good2", withBlob),
      ("bad1", Array[Byte](1, 2, 3)), ("bad2", Array[Byte](9, 9))
    ).toDF("id", "blob")
    val da = DocArray(docs, "id").withImagePhash()
    val hashes = da.df.select("id", "phash").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(hashes("good1").isDefined && hashes("good1") == hashes("good2"))
    assert(hashes("bad1").isEmpty && hashes("bad2").isEmpty)
    val pairs = DocArray(docs, "id").imageNearDupPairs()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // the identical pair is found; the corrupt blobs pair with NOTHING
    assert(pairs == Set(("good1", "good2")))
  }

  test("tokenEntropy: uniform ln(n), constant 0, hand-mixed case, empty") {
    val df = Seq(
      (1L, "a b c d"),          // uniform over 4 -> ln 4
      (2L, "x x x x"),          // constant -> 0
      (3L, "a a b"),            // (2/3, 1/3) mix
      (4L, "")                  // no tokens -> zeros
    ).toDF("doc_id", "text")
    val out = graft.operators.Quality.tokenEntropy(df, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    def term(p: Double): Long = math.round(-p * math.log(p) * 1e9)
    assert(out(1L)._1 === 4L && out(1L)._2 === 4L)
    assert(out(1L)._3 === 4 * term(0.25))
    assert(out(2L) === ((4L, 1L, 0L, 0.0)))
    val want3 = term(2.0 / 3.0) + term(1.0 / 3.0)
    assert(out(3L)._3 === want3)
    assert(out(4L) === ((0L, 0L, 0L, 0.0)))
  }

  test("splitHashed: disjoint cover, deterministic, near-nominal shares") {
    import graft.operators.GroupOps
    val df = spark.range(10000).toDF("id")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = GroupOps.splitHashed(df, col("id"), seed = 3L, fr)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 10000)
    assert(math.abs(counts("train") - 8000) < 300)
    assert(math.abs(counts("val") - 1000) < 150)
    // layout-invariant: same labels after a reshuffle
    val b = GroupOps.splitHashed(df.repartition(13), col("id"), seed = 3L, fr)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    // a different seed re-deals
    val c = GroupOps.splitHashed(df, col("id"), seed = 4L, fr)
    assert(a.except(c).count() > 0)
    intercept[IllegalArgumentException] {
      GroupOps.splitHashed(df, col("id"), 1L, Seq("x" -> 0.5, "y" -> 0.4))
    }
  }

  test("stripHtml: subtree drops, block newlines, entity order, collapse") {
    import spark.implicits._
    def strip(s: String): String =
      Seq(s).toDF("h").select(TextFunctions.stripHtml(col("h"))).as[String].head
    assert(strip("<html><head><style>p {color: red}</style>" +
      "<script>if (1 < 2 && x > 3) { alert(\"hi\"); }</script></head>" +
      "<body><h1>Title</h1><p>Hello   world</p><br><div>end</div></body></html>")
      == "Title\nHello world\nend")
    // comments drop; entities decode in the documented order: &amp; LAST,
    // so double-encoded text decodes exactly one level and a decoded
    // &lt;b&gt; stays literal text (tags are stripped BEFORE decode)
    assert(strip("<!-- c -->a &amp;amp; b &lt;b&gt; c&nbsp;d") == "a &amp; b <b> c d")
    // unclosed/plain text passes through; edge blank runs trim fully
    assert(strip("  \n\n x  y \n ") == "x y")
    // numeric refs are left as-is (documented: apply cleanText after)
    assert(strip("<p>a&#65;b</p>") == "a&#65;b")
  }

  test("blocklistKeep: token-level containment, case-folded, null-safe") {
    import graft.operators.Quality
    val df = Seq(
      (0L, "a perfectly clean document"),
      (1L, "contains the BADWORD here"),       // case-folds to a hit
      (2L, "badwordish embadwordded survive"), // substrings are NOT tokens
      (3L, "punct exposes it: badword!"),      // tokenizer splits punct
      (4L, ""),
      (5L, null.asInstanceOf[String])).toDF("id", "t")
    val got = Quality.blocklistFilter(df, col("t"), Seq("badword"))
      .orderBy("id").collect().map(r => r.getBoolean(2))
    assert(got.toSeq == Seq(true, false, true, false, true, false))
  }

  test("benfordDigits: exact digit counts from integer strings, expected ppb, nonpositive dropped") {
    val vals = Seq(1L, 19L, 123L, 2L, 25L, 999L, 0L, -7L)
    val out = Quality.benfordDigits(vals.toDF("v"), col("v"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // digits: 1,1,1,2,2,9 (0 and -7 dropped) -> n = 6
    assert(out.keySet == Set(1, 2, 9))
    assert(out(1)._1 == 3L && out(2)._1 == 2L && out(9)._1 == 1L)
    assert(out(1)._2 == math.round(math.log(2.0) / math.log(10.0) * 1e9))
    // contribution replays the double chain exactly
    val p9 = math.log(1.0 + 1.0 / 9) / math.log(10.0)
    val d9 = 1.0 - 6.0 * p9
    assert(out(9)._3 == math.round(d9 * d9 / (6.0 * p9) * 1e6))
  }

  test("fleschCounts: hand syllables/sentences, vowel-less floor, empty doc") {
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, "The cat sat. The dog ran! Really?"),
      (2L, "xyz qqq"), // no vowels -> 1 syllable per word
      (3L, "")
    ).toDF("id", "text")
    val out = docs.select(col("id"),
        TextFunctions.fleschCounts(col("text")).as("f"))
      .select(col("id"), col("f.n_words"), col("f.n_sent"), col("f.n_syll"),
        TextFunctions.fleschScore(col("f.n_words"), col("f.n_sent"),
          col("f.n_syll")).as("fs"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))).toMap
    // "the cat sat the dog ran really": 7 words, 3 sentences,
    // syllables: the=1 cat=1 sat=1 the=1 dog=1 ran=1 really=3 (ea,y... e-a-y runs: r[ea]ll[y] -> 2) = 8
    assert(out(1L)._1 === 7 && out(1L)._2 === 3)
    assert(out(1L)._3 === 8) // really -> 'ea' and 'y' = 2 runs
    val want = 206.835 - 1.015 * (7.0 / 3.0) - 84.6 * (8.0 / 7.0)
    assert(math.abs(out(1L)._4 - want) < 1e-12)
    assert(out(2L) === ((2, 1, 2, 206.835 - 1.015 * 2.0 - 84.6 * 1.0)))
    assert(out(3L)._1 === 0 && out(3L)._4.isNaN) // null score
  }

  test("expectations: null rule = violation, duplicate mass, FK orphans incl. null key") {
    val df = Seq((1L, Some(10L)), (2L, Some(-5L)), (3L, None),
      (3L, Some(7L))).toDF("k", "v")
    val rows = Quality.expectRows(df, Seq(
        "v_positive" -> (col("v") > 0L),
        "k_small" -> (col("k") < 100L)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // the NULL v row is unverifiable -> counts as a violation
    assert(rows("v_positive") == ((4L, 2L)))
    assert(rows("k_small") == ((4L, 0L)))
    val uq = Quality.expectUnique(df, Seq("k")).head
    assert(uq.getLong(1) == 4L && uq.getLong(2) == 1L) // one extra '3'
    val parent = Seq(1L, 2L).map(Tuple1(_)).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(9L), None).map(Tuple1(_))
      .toDF("fk")
    val fk = Quality.expectForeignKey(child, col("fk"), parent, col("pk"))
      .head
    assert(fk.getLong(1) == 4L && fk.getLong(2) == 2L) // orphan 9 + null
  }

  test("skewReport: exact counts/shares, (cnt desc, key asc) tie order, topN cap") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 1),
      ("c", 3), ("d", 3)).toDF("g", "h")
    val got = Quality.skewReport(df, Seq("g", "h"), topN = 3)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // counts: a|1=2, b|1=2, a|2=1, c|3=1, d|3=1; total 7, 5 keys;
    // ties: a|1 before b|1 (key asc), then a|2 (smallest key of the 1s)
    assert(got.toSeq == Seq(
      (1, "a|1", 2L, 285714L, 7L, 5L),
      (2, "b|1", 2L, 285714L, 7L, 5L),
      (3, "a|2", 1L, 142857L, 7L, 5L)))
    // layout invariance
    val got5 = Quality.skewReport(df.repartition(5), Seq("g", "h"), 3)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got5.toSeq == Seq((1, "a|1"), (2, "b|1"), (3, "a|2")))
  }

  test("inclusion: exact distinct containment both ways, nulls excluded") {
    val a = Seq(Some(1), Some(2), Some(2), Some(3), None).map(Tuple1(_))
      .toDF("k")
    val b = Seq(2, 3, 4, 5).map(Tuple1(_)).toDF("k")
    val r = Quality.inclusion(a, col("k"), b, col("k")).head
    // A = {1,2,3}, B = {2,3,4,5}, shared = {2,3}
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 4L, 2L)))
    assert(r.getLong(3) == 666666L) // 2/3 of A in B
    assert(r.getLong(4) == 500000L) // 2/4 of B in A
  }

  test("compactionPlan: next-fit byte-range bins, oversize files alone") {
    import graft.operators.ZOrder
    val files = Seq(("a", 60L), ("b", 30L), ("c", 30L), ("d", 250L),
      ("e", 10L)).toDF("path", "bytes")
    val got = ZOrder.compactionPlan(files, "path", "bytes", 100L)
      .select("path", "bin", "bin_bytes", "bin_files")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // cumulative-before: a=0,b=60,c=90,d=120,e=370 -> bins 0,0,0,1,3
    assert(got("a")._1 == 0L && got("b")._1 == 0L && got("c")._1 == 0L)
    assert(got("d")._1 == 1L) // the oversize file sits alone in bin 1
    assert(got("e")._1 == 3L)
    assert(got("a")._2 == 120L && got("a")._3 == 3L) // bin 0 totals
    assert(got("d")._2 == 250L && got("d")._3 == 1L)
  }
}
