package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.plans.TopKBuffer

/** Property-based checks of the hand-rolled kernels against trivially
  * correct reference implementations (raw scalacheck generators, seeded
  * so runs are reproducible). */
class PropertySpec extends SparkSuite {

  private def forAll[T](gen: Gen[T], n: Int = 60)(f: T => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(v) => f(v); produced += 1
        case None =>
      }
      seed = seed.next
      attempts += 1
    }
    assert(produced > 0, "generator produced nothing")
  }

  private def whenever(c: Boolean)(f: => Unit): Unit = if (c) f

  test("TopKBuffer equals sort-take-k for arbitrary inputs and merges") {
    val gen = for {
      k <- Gen.choose(1, 12)
      xs <- Gen.listOf(Gen.choose(-1e6, 1e6))
      split <- Gen.choose(0, math.max(xs.length, 1))
    } yield (k, xs, split)
    forAll(gen) { case (k, xs, split) =>
      // single buffer
      val buf = new TopKBuffer(k)
      xs.zipWithIndex.foreach { case (d, i) => buf.insert(d, i.toLong) }
      val got = buf.sortedEntries.map(_._1).toSeq
      val want = xs.sorted.take(k)
      assert(got == want)
      // two partial buffers merged
      val (l, r) = xs.splitAt(math.min(split, xs.length))
      val b1 = new TopKBuffer(k); val b2 = new TopKBuffer(k)
      l.zipWithIndex.foreach { case (d, i) => b1.insert(d, i.toLong) }
      r.zipWithIndex.foreach { case (d, i) => b2.insert(d, i.toLong) }
      b2.sortedEntries.foreach { case (d, v) => b1.insert(d, v) }
      assert(b1.sortedEntries.map(_._1).toSeq == want)
    }
  }

  test("fused minhash_text equals composed pipeline for arbitrary text") {
    import org.apache.spark.sql.functions._
    import graft.functions._
    import graft.functions.TextFunctions
    import spark.implicits._
    val texts = Gen.listOfN(24, Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("the", "cat", "SAT", "on", "a", "123", "", "  "))
        .map(_.mkString(" "))))
    forAll(texts) { ts =>
      whenever(ts.nonEmpty) {
        val df = ts.toDF("text")
        val cmp = df.select(
          minhash_text($"text", 2, 16).as("fast"),
          minhash_signature(TextFunctions.wordNgrams($"text", 2), 16).as("ref"))
          .collect()
        cmp.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
      }
    }
  }

  test("fused token_top_stats equals the HOF repetition formulas for arbitrary text (r8)") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    import spark.implicits._
    // the PRE-r8 Column formulations, inlined as the reference
    def toks(c: org.apache.spark.sql.Column) =
      filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")
    def refTopWord(c: org.apache.spark.sql.Column) = {
      val ts = toks(c)
      when(size(ts) === 0, lit(0.0)).otherwise(
        array_max(transform(array_distinct(ts),
          w => size(filter(ts, t => t === w)))).cast("double") / size(ts))
    }
    def refTopBigram(c: org.apache.spark.sql.Column) = {
      val gs = TextFunctions.wordNgrams(c, 2)
      when(size(gs) === 0, lit(0.0)).otherwise(
        array_max(transform(array_distinct(gs),
          g => size(filter(gs, x => x === g)))).cast("double") / size(gs))
    }
    def refDupWord(c: org.apache.spark.sql.Column) = {
      val ts = toks(c)
      when(size(ts) === 0, lit(0.0)).otherwise(
        lit(1.0) - size(array_distinct(ts)).cast("double") / size(ts))
    }
    def refMeanLen(c: org.apache.spark.sql.Column) = {
      val ts = toks(c)
      when(size(ts) === 0, lit(0.0)).otherwise(
        aggregate(ts, lit(0L), (acc, t) => acc + length(t))
          .cast("double") / size(ts))
    }
    val texts = Gen.listOfN(24, Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("the", "the", "cat cat", "SAT", "on", "a",
        "123", "", "  ", "x\ny"))
        .map(_.mkString(" "))))
    forAll(texts) { ts =>
      whenever(ts.nonEmpty) {
        val df = ts.toDF("text")
        val cmp = df.select(
          TextFunctions.topWordFrac($"text").as("f1"), refTopWord($"text").as("r1"),
          TextFunctions.topBigramFrac($"text").as("f2"), refTopBigram($"text").as("r2"),
          TextFunctions.dupWordFrac($"text").as("f3"), refDupWord($"text").as("r3"),
          TextFunctions.meanTokenLength($"text").as("f4"), refMeanLen($"text").as("r4"))
          .collect()
        cmp.foreach { r =>
          assert(r.getDouble(0) == r.getDouble(1), s"topWord: $r")
          assert(r.getDouble(2) == r.getDouble(3), s"topBigram: $r")
          assert(r.getDouble(4) == r.getDouble(5), s"dupWord: $r")
          assert(r.getDouble(6) == r.getDouble(7), s"meanLen: $r")
        }
      }
    }
  }

  test("fused gopher_aux_stats equals the HOF line/word formulas for arbitrary text (r8)") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    import spark.implicits._
    def toks(c: org.apache.spark.sql.Column) =
      filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")
    def lns(c: org.apache.spark.sql.Column) =
      filter(split(c, "\n"), l => length(l) > 0)
    def refDupLine(c: org.apache.spark.sql.Column) = {
      val ls = lns(c)
      when(size(ls) === 0, lit(0.0)).otherwise(
        lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls))
    }
    def refBullet(c: org.apache.spark.sql.Column) = {
      val ls = lns(c)
      when(size(ls) === 0, lit(0.0)).otherwise(
        size(filter(ls, l => trim(l).rlike("^[-*\\u2022]")))
          .cast("double") / size(ls))
    }
    def refEllipsis(c: org.apache.spark.sql.Column) = {
      val ls = lns(c)
      when(size(ls) === 0, lit(0.0)).otherwise(
        size(filter(ls, l => rtrim(l).rlike("(\\.\\.\\.|\\u2026)$")))
          .cast("double") / size(ls))
    }
    def refAlpha(c: org.apache.spark.sql.Column) = {
      val ts = toks(c)
      when(size(ts) === 0, lit(0.0)).otherwise(
        size(filter(ts, t => t.rlike("[a-z]"))).cast("double") / size(ts))
    }
    val stops = Seq("the", "be", "to", "of", "and")
    def refStops(c: org.apache.spark.sql.Column) =
      size(array_intersect(array_distinct(toks(c)),
        array(stops.map(lit): _*)))
    def refSymbols(c: org.apache.spark.sql.Column) = {
      val n = size(toks(c))
      when(n === 0, lit(0.0)).otherwise(
        length(regexp_replace(c, "[^#\\u2026]", "")).cast("double") / n)
    }
    val texts = Gen.listOfN(20, Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("- item", "* b", "• dot", "end...",
        "trail…", "x..", "   - pad  ", "the cat", "BE to", "#tag",
        "a#b…c", "", "  ", "99", "été"))
        .map(_.mkString("\n"))))
    forAll(texts) { ts =>
      whenever(ts.nonEmpty) {
        val df = ts.toDF("text")
        val cmp = df.select(
          TextFunctions.dupLineFrac($"text").as("f1"), refDupLine($"text").as("r1"),
          TextFunctions.bulletLineFrac($"text").as("f2"), refBullet($"text").as("r2"),
          TextFunctions.ellipsisLineFrac($"text").as("f3"), refEllipsis($"text").as("r3"),
          TextFunctions.alphaWordFrac($"text").as("f4"), refAlpha($"text").as("r4"),
          TextFunctions.distinctStopwordCount($"text", stops).as("f5"),
          refStops($"text").as("r5"),
          TextFunctions.symbolWordRatio($"text").as("f6"), refSymbols($"text").as("r6"))
          .collect()
        cmp.foreach { r =>
          assert(r.getDouble(0) == r.getDouble(1), s"dupLine: $r")
          assert(r.getDouble(2) == r.getDouble(3), s"bullet: $r")
          assert(r.getDouble(4) == r.getDouble(5), s"ellipsis: $r")
          assert(r.getDouble(6) == r.getDouble(7), s"alpha: $r")
          assert(r.getInt(8) == r.getInt(9), s"stops: $r")
          assert(r.getDouble(10) == r.getDouble(11), s"symbols: $r")
        }
      }
    }
  }

  test("native band_hashes equals the xxhash64-over-slices formulation (r8)") {
    import org.apache.spark.sql.functions._
    import graft.functions._
    import spark.implicits._
    val sigs = Gen.listOfN(16,
      Gen.listOfN(128, Gen.choose(Long.MinValue, Long.MaxValue)))
    forAll(sigs) { ss =>
      whenever(ss.nonEmpty) {
        val df = ss.toDF("sig")
        val bands = 32; val rows = 4
        val cmp = df.select(
          band_hashes($"sig", bands, rows, seed = 42L).as("fast"),
          transform(sequence(lit(0), lit(bands - 1), lit(1)),
            b => xxhash64(lit(42L), b,
              slice($"sig", b * rows + 1, lit(rows)))).as("ref"))
          .collect()
        cmp.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
      }
    }
    // short signatures mirror slice semantics
    val short = Seq(Seq(1L, 2L, 3L)).toDF("sig")
    val c = short.select(
      band_hashes($"sig", 2, 2, 7L).as("fast"),
      transform(sequence(lit(0), lit(1), lit(1)),
        b => xxhash64(lit(7L), b, slice($"sig", b * 2 + 1, lit(2))))
        .as("ref")).collect().head
    assert(c.getSeq[Long](0) == c.getSeq[Long](1))
  }

  test("native cosine_lsh equals the Column-algebra formulation") {
    import org.apache.spark.sql.functions._
    import graft.functions._
    import spark.implicits._
    val dim = 16
    val vecs = Gen.listOfN(dim, Gen.chooseNum(-5.0f, 5.0f))
    forAll(Gen.listOfN(8, vecs), n = 10) { vs =>
      val df = vs.map(v => Tuple1(v)).toDF("vec")
      // reference: one zip_with+aggregate traversal per plane, double math
      val rnd = new java.util.Random(42L)
      val planes = Array.fill(24, dim)(rnd.nextGaussian())
      val v = $"vec".cast("array<double>")
      val ref = planes.zipWithIndex.map { case (p, i) =>
        val dot = aggregate(
          zip_with(v, lit(p), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
        when(dot > 0, lit(1L) * (1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      val cmp = df.select(cosine_lsh($"vec", dim, 24).as("fast"), ref.as("slow"))
        .collect()
      cmp.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    }
  }

  test("png/bmp encode→decode is the identity for arbitrary uint8 tensors") {
    import org.apache.spark.sql.functions._
    import graft.operators.Multimodal
    import spark.implicits._
    val dims = for {
      h <- Gen.chooseNum(1, 12); w <- Gen.chooseNum(1, 12)
      seed <- Gen.chooseNum(0, 10000)
    } yield (h, w, seed)
    forAll(dims, n = 12) { case (h, w, seed) =>
      val rnd = new java.util.Random(seed)
      val vals = Seq.fill(h * w * 3)(rnd.nextInt(256).toFloat)
      val df = Seq((vals, Seq(h, w, 3))).toDF("values", "shape")
      Seq("png", "bmp").foreach { fmt =>
        val r = df
          .withColumn("blob", Multimodal.encodeImage($"values", $"shape", lit(fmt)))
          .withColumn("back", Multimodal.decodeImage($"blob", lit(0), lit(0)))
          .select($"back.values", $"back.shape").collect()(0)
        assert(r.getSeq[Int](1) == Seq(h, w, 3), s"$fmt shape $h x $w")
        assert(r.getSeq[Float](0) == vals, s"$fmt values $h x $w seed $seed")
      }
    }
  }

  test("resizeNearest matches the reference linspace/rint grid point-wise") {
    import org.apache.spark.sql.functions._
    import graft.operators.Multimodal
    import spark.implicits._
    val cases = for {
      h <- Gen.chooseNum(2, 16); w <- Gen.chooseNum(2, 16)
      oh <- Gen.chooseNum(1, 16); ow <- Gen.chooseNum(1, 16)
    } yield (h, w, oh, ow)
    forAll(cases, n = 20) { case (h, w, oh, ow) =>
      val vals = Seq.tabulate(h * w * 3)(_.toFloat)
      val got = Seq((vals, Seq(h, w, 3))).toDF("values", "shape")
        .select(Multimodal.resizeNearest($"values", $"shape", lit(oh), lit(ow)).as("r"))
        .select($"r.values").collect()(0).getSeq[Float](0)
      // reference: image.py:110-123 — linspace(0, in-2, out), np.around
      // (half-to-even, = math.rint), clip to [0, in-1]
      def grid(n: Int, out: Int) = Array.tabulate(out) { j =>
        val pos = if (out <= 1) 0.0 else j.toDouble * (n - 2).toDouble / (out - 1)
        math.max(0, math.min(n - 1, math.rint(pos).toInt))
      }
      val exp = for {
        y <- 0 until oh; x <- 0 until ow; c <- 0 until 3
      } yield vals((grid(h, oh)(y) * w + grid(w, ow)(x)) * 3 + c)
      assert(got == exp, s"$h x $w -> $oh x $ow")
    }
  }

  test("text_ngrams equals regex tokenization + sliding for arbitrary text") {
    import org.apache.spark.sql.functions._
    import graft.functions._
    forAll(Gen.asciiPrintableStr) { s =>
      val expected = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      import spark.implicits._
      val got = Seq(s).toDF("text")
        .select(text_ngrams($"text", 2)).as[Seq[String]].collect()(0)
      assert(got == expected, s"input=${s.take(60)}")
    }
  }

  test("urlCanonicalize is idempotent over generated URL shapes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gen = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
      host <- Gen.oneOf("Example.COM", "www.example.com", "A.B.example.org")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/x", "/x/", "/x/y///")
      query <- Gen.oneOf("", "?b=2&a=1", "?utm_source=t&a=1", "?utm_only=1")
      frag <- Gen.oneOf("", "#sec")
    } yield s"$scheme://$host$port$path$query$frag"
    forAll(gen, n = 40) { u =>
      val Array(once, twice) = Seq(u).toDF("url").select(
        graft.functions.UrlFunctions.urlCanonicalize($"url").as("c1"))
        .select($"c1", graft.functions.UrlFunctions.urlCanonicalize($"c1"))
        .as[(String, String)].collect().flatMap(t => Array(t._1, t._2))
      assert(once == twice, s"not idempotent: $u → $once → $twice")
    }
  }

  test("zvalue is a bijection on in-range int pairs (curve = total order)") {
    import spark.implicits._
    import graft.operators.ZOrder
    val gen = for {
      a <- Gen.choose(0L, 255L)
      b <- Gen.choose(0L, 255L)
    } yield (a, b)
    val seen = scala.collection.mutable.Map[Long, (Long, Long)]()
    val pairs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    forAll(gen, n = 60)(p => pairs += p)
    val rows = pairs.toSeq.distinct.toDF("a", "b")
      .select($"a", $"b", ZOrder.zvalue(8, $"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (a, b, z) =>
      assert(z >= 0 && z < (1L << 16))
      // invert: even bits back to a, odd bits to b
      val ia = (0 until 8).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val ib = (0 until 8).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(ia == a && ib == b, s"($a,$b) -> $z -> ($ia,$ib)")
      seen.get(z).foreach(prev => assert(prev == ((a, b)), "collision"))
      seen(z) = (a, b)
    }
  }

  test("KmvBuffer equals distinct-sort-take-k for arbitrary longs incl. extremes") {
    import graft.functions.KmvBuffer
    val gen = for {
      k <- Gen.choose(2, 12)
      xs <- Gen.listOf(Gen.oneOf(
        Gen.choose(Long.MinValue, Long.MaxValue),
        Gen.oneOf(0L, -1L, 1L, Long.MinValue, Long.MaxValue)))
      split <- Gen.choose(0, math.max(0, xs.length))
    } yield (k, xs, split)
    forAll(gen) { case (k, xs, split) =>
      val want = xs.distinct.sortBy(_ ^ Long.MinValue).take(k)
      val one = new KmvBuffer(k)
      xs.foreach(one.insert)
      assert(one.sortedSigned.toList == want, s"single-buffer k=$k")
      // arbitrary split + merge must land on the same bottom-k
      val (l, r) = xs.splitAt(split)
      val a = new KmvBuffer(k); l.foreach(a.insert)
      val b = new KmvBuffer(k); r.foreach(b.insert)
      val it = b.set.iterator()
      while (it.hasNext) a.insert(it.next() ^ Long.MinValue)
      assert(a.sortedSigned.toList == want, s"merged k=$k split=$split")
    }
  }

  test("CoMomentBuffer sums are split-invariant for arbitrary integer vectors") {
    import graft.functions.CoMomentBuffer
    val gen = for {
      d <- Gen.choose(1, 5)
      rows <- Gen.nonEmptyListOf(Gen.listOfN(d, Gen.choose(-10000L, 10000L)))
      split <- Gen.choose(0, rows.length)
    } yield (d, rows.map(_.toArray), split)
    forAll(gen, n = 40) { case (d, rows, split) =>
      val whole = new CoMomentBuffer(d)
      rows.foreach(whole.add)
      val (l, r) = rows.splitAt(split)
      val a = new CoMomentBuffer(d); l.foreach(a.add)
      val b = new CoMomentBuffer(d); r.foreach(b.add)
      a.merge(b)
      assert(a.n == whole.n && a.sx.toList == whole.sx.toList &&
        a.sxy.toList == whole.sxy.toList)
      // triangle cells against the naive definition
      var t = 0
      for (i <- 0 until d; j <- i until d) {
        assert(whole.sxy(t) == rows.map(v => v(i) * v(j)).sum, s"t($i,$j)")
        t += 1
      }
    }
  }
}
