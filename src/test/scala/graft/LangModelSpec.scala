package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{bytes_to_ints, sq_encode}
import graft.operators.{GroupOps, LangModel}

class LangModelSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the dog sat on the log"),
    (2L, "the cat sat on the mat"),       // exact dup of 0
    (3L, "xylophone quartz"),             // rare tokens -> high nll
    (4L, "the the the the"),              // most common token -> low nll
    (5L, "")                              // no tokens
  ).toDF("id", "text")

  test("unigramNll: dup docs score identically, rare tokens score higher") {
    val model = LangModel.unigramFit(corpus, col("text"))
    val got = LangModel.unigramNll(corpus, model, "id", col("text"))
      .orderBy("id").collect()
    assert(got.length == 6)
    val nll = got.map(r => if (r.isNullAt(2)) Double.NaN else r.getDouble(2))
    assert(nll(0) == nll(2), "identical text, identical score")
    assert(nll(3) > nll(0), "rare tokens are more surprising")
    assert(nll(4) < nll(0), "the most common token is the least surprising")
    assert(got(5).isNullAt(2) && got(5).getInt(1) == 0, "empty doc: null nll")
    // hand-check doc 4: p(the) = n_the / total
    val nThe = model.where(col("word") === "the").head.getLong(1)
    val total = model.agg(sum("n")).head.getLong(0)
    assert(math.abs(nll(4) - (-math.log(nThe.toDouble / total))) < 1e-12)
  }

  test("bigramNll: MLE conditional probabilities, hand-checked") {
    // corpus: "a b", "a b", "a c" -> c(a,b)=2, c(a,c)=1, c(a,.)=3
    val docs = Seq((0L, "a b"), (1L, "a b"), (2L, "a c"), (3L, "solo"))
      .toDF("id", "text")
    val model = LangModel.bigramFit(docs, col("text"))
    assert(model.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap == Map(("a", "b") -> 2L, ("a", "c") -> 1L))
    val got = LangModel.bigramNll(docs, model, "id", col("text"))
      .orderBy("id").collect()
    assert(math.abs(got(0).getDouble(2) - (-math.log(2.0 / 3))) < 1e-12)
    assert(math.abs(got(2).getDouble(2) - (-math.log(1.0 / 3))) < 1e-12)
    assert(got(0).getDouble(2) == got(1).getDouble(2), "dup docs equal")
    assert(got(3).isNullAt(2) && got(3).getInt(1) == 0, "single token: no pairs")
  }

  test("unigramBuckets equals the window-ntile formulation, any n % buckets") {
    val rng = new scala.util.Random(7)
    val words = Seq("a", "b", "c", "d", "e", "f", "g")
    for (n <- Seq(23, 40)) {
      val docs = (0L until n.toLong)
        .map(i => (i, Seq.fill(3 + rng.nextInt(5))(words(rng.nextInt(words.length))).mkString(" ")))
        .toDF("id", "text")
      val model = LangModel.unigramFit(docs, col("text"))
      val got = LangModel.unigramBuckets(docs, model, "id", col("text"), buckets = 7)
        .select("id", "bucket").as[(Long, Int)].collect().toMap
      val want = LangModel.unigramNll(docs, model, "id", col("text"))
        .withColumn("bucket",
          ntile(7).over(Window.orderBy(col("nll").asc_nulls_last, col("id"))))
        .select("id", "bucket").as[(Long, Int)].collect().toMap
      assert(got == want, s"n=$n")
    }
  }

  test("sampleTemperatureBySize: size=1 equals the doc-count rule; " +
      "token mass shifts quotas") {
    val df = (
      (0L until 400L).map(i => (i, "big", 10)) ++
      (400L until 500L).map(i => (i, "fat", 200))).toDF("id", "src", "ntok")
    // size=1 degenerates to sampleTemperature exactly
    val a = GroupOps.sampleTemperature(df, 50L, 0.5, 3L, col("src"), col("id"))
      .select("id").as[Long].collect().toSet
    val b = GroupOps.sampleTemperatureBySize(df, 50L, 0.5, 3L, col("src"),
      col("id"), lit(1L)).select("id").as[Long].collect().toSet
    assert(a == b)
    // by token mass, "fat" (100 docs × 200 tok = 20k) outweighs "big"
    // (400 × 10 = 4k): sqrt(20000)/(sqrt(20000)+sqrt(4000)) of 50 ≈ 34
    val byMass = GroupOps.sampleTemperatureBySize(df, 50L, 0.5, 3L,
      col("src"), col("id"), col("ntok"))
      .groupBy("src").count().as[(String, Long)].collect().toMap
    val s = math.sqrt(20000.0) + math.sqrt(4000.0)
    assert(byMass("fat") == math.floor(math.sqrt(20000.0) / s * 50).toLong)
    assert(byMass("big") == math.floor(math.sqrt(4000.0) / s * 50).toLong)
    // the doc-count rule would have given "big" the larger share
    val byCount = GroupOps.sampleTemperature(df, 50L, 0.5, 3L, col("src"), col("id"))
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(byCount("big") > byCount("fat") && byMass("fat") > byMass("big"))
  }

  test("sampleTemperature: quotas follow count^alpha, draw is layout-invariant") {
    val df = (
      (0L until 800L).map(i => (i, "big")) ++
      (800L until 1000L).map(i => (i, "mid")) ++
      (1000L until 1008L).map(i => (i, "tiny"))).toDF("id", "src")

    val picked = GroupOps.sampleTemperature(df, total = 100L, alpha = 0.5,
      seed = 3L, col("src"), col("id"))
    val bySrc = picked.groupBy("src").count().as[(String, Long)].collect().toMap
    // quotas: floor(sqrt(n)/sum * 100), min 1
    val sum = math.sqrt(800) + math.sqrt(200) + math.sqrt(8)
    assert(bySrc("big") == math.floor(math.sqrt(800) / sum * 100).toLong)
    assert(bySrc("mid") == math.floor(math.sqrt(200) / sum * 100).toLong)
    assert(bySrc("tiny") == math.floor(math.sqrt(8) / sum * 100).toLong.max(1L))
    // alpha=0.5 up-weights small groups vs natural proportions
    assert(bySrc("mid").toDouble / bySrc("big") > 200.0 / 800.0)

    val again = GroupOps.sampleTemperature(df.repartition(17), total = 100L,
      alpha = 0.5, seed = 3L, col("src"), col("id"))
    assert(picked.select("id").as[Long].collect().toSet ==
      again.select("id").as[Long].collect().toSet, "layout-invariant")

    // alpha = 1 keeps natural proportions; alpha = 0 is uniform-ish
    val nat = GroupOps.sampleTemperature(df, 100L, 1.0, 3L, col("src"), col("id"))
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(nat("big") > bySrc("big") && nat("tiny") == 1L)
    val uni = GroupOps.sampleTemperature(df, 30L, 0.0, 3L, col("src"), col("id"))
      .groupBy("src").count().as[(String, Long)].collect().toMap
    // uniform quota of 10 per group; tiny only has 8 rows to give
    assert(uni("big") == 10L && uni("mid") == 10L && uni("tiny") == 8L)
  }

  test("bytes_to_ints round-trips sq_encode codes through codegen") {
    val df = Seq((1L, Array(0.0f, 127.5f, 255.0f, 300.0f, -5.0f)))
      .toDF("id", "vec")
    val mins = Seq.fill(5)(0.0)
    val deltas = Seq.fill(5)(1.0)
    val got = df.select(bytes_to_ints(sq_encode(col("vec"), mins, deltas)))
      .head.getSeq[Int](0)
    // 127.5 rounds half-to-even -> 128, out-of-range clamps
    assert(got == Seq(0, 128, 255, 255, 0))
    assert(df.select(bytes_to_ints(lit(null).cast("binary"))).head.isNullAt(0))
  }

  test("unigramNll transfer scoring: OOV tokens hit the Laplace branch") {
    import org.apache.spark.sql.functions._
    val fit = Seq((0L, "aa aa bb")).toDF("id", "t") // model: aa->2, bb->1, N=3
    val score = Seq((1L, "aa bb"), (2L, "aa zz")).toDF("id", "t")
    val model = LangModel.unigramFit(fit, col("t"))
    val r = LangModel.unigramNll(score, model, "id", col("t"), smooth = 1.0)
      .orderBy("id").collect()
    val in = -(math.log(2.0 / 3) + math.log(1.0 / 3)) / 2   // aa, bb
    val oov = -(math.log(2.0 / 3) + math.log(1.0 / 3)) / 2  // zz -> ln(1/3)
    assert(math.abs(r(0).getDouble(2) - in) < 1e-12)
    assert(math.abs(r(1).getDouble(2) - oov) < 1e-12)
    // the OOV doc scores the same as (aa, bb) here because smooth=1 makes
    // zz's pseudo-count equal bb's real count -- assert that equivalence
    // explicitly so the smoothing semantics are pinned
    assert(r(0).getDouble(2) == r(1).getDouble(2))
  }

  test("tokenEntropy: hand-checked, empty-safe, uniform max") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    val df = Seq((0L, "aa aa bb"), (1L, ""), (2L, "a b c d"),
      (3L, "x x x x")).toDF("id", "t")
      .select(col("id"), TextFunctions.tokenEntropy(col("t")).as("h"))
      .orderBy("id").collect()
    val h0 = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(df(0).getDouble(1) - h0) < 1e-12)
    assert(df(1).getDouble(1) == 0.0)
    assert(math.abs(df(2).getDouble(1) - math.log(4)) < 1e-12)
    // POSITIVE zero, not -0.0 (negating the 1*ln(1) sum would give -0.0,
    // which rounds differently across engines): pin the sign via 1/x
    assert(df(3).getDouble(1) == 0.0 && 1.0 / df(3).getDouble(1) > 0)
  }

  test("kneserNey: P(·|w1) sums to 1 over the model vocabulary (seen w1)") {
    val docs = Seq((0L, "a b a c a b b c c a"), (1L, "b a c b a a")).toDF("doc_id", "t")
    val model = LangModel.bigramFit(docs, col("t")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val d = 0.75
    val types = model.size.toDouble
    val c1 = model.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1p = model.groupBy(_._1._1).view.mapValues(_.size).toMap
    val dl = model.groupBy(_._1._2).view.mapValues(_.size).toMap
    val vocab = (model.keys.map(_._1) ++ model.keys.map(_._2)).toSet
    for (w1 <- c1.keys) {
      // the interpolated-KN normalization identity: Σ_w2 P(w2|w1) = 1 when
      // Pcont itself is a distribution — check over the continuation vocab
      val contTotal = dl.values.sum.toDouble // Σ dl = |types| by construction
      assert(contTotal == types)
      val s = vocab.toSeq.map { w2 =>
        val c12 = model.getOrElse((w1, w2), 0L).toDouble
        val pc = dl.getOrElse(w2, 0).toDouble / types
        (math.max(c12 - d, 0.0) + d * n1p(w1) * pc) / c1(w1)
      }.sum
      assert(math.abs(s - 1.0) < 1e-12, s"P(.|$w1) sums to $s")
    }
  }

  test("kneserNey operator matches the hand formula and handles transfer OOV") {
    val train = Seq((0L, "a b a c a b"), (1L, "b c a b")).toDF("doc_id", "t")
    val model = LangModel.bigramFit(train, col("t"))
    // same-corpus scoring: every pair seen → the discounted branch only
    val got = LangModel.kneserNeyBigramNll(train, model, "doc_id", col("t"))
      .orderBy("doc_id").collect()
    val m = model.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val types = m.size.toDouble
    val c1 = m.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1p = m.groupBy(_._1._1).view.mapValues(_.size).toMap
    val dl = m.groupBy(_._1._2).view.mapValues(_.size).toMap
    def lp(w1: String, w2: String): Double = {
      val c12 = m.getOrElse((w1, w2), 0L).toDouble
      math.log((math.max(c12 - 0.75, 0.0) +
        (0.75 * n1p(w1)) * (dl(w2) / types)) / c1(w1))
    }
    val doc0 = Seq("a" -> "b", "b" -> "a", "a" -> "c", "c" -> "a", "a" -> "b")
    val exp0 = -doc0.map { case (x, y) => lp(x, y) }.sum / doc0.size
    assert(got(0).getInt(1) == 5)
    assert(math.abs(got(0).getDouble(2) - exp0) < 1e-12)

    // transfer: unseen pair ("c","b") → continuation-only; unseen w1
    // ("zz") → bare Pcont; unseen w2 ("qq") → 1/types phantom mass
    val test = Seq((9L, "c b"), (10L, "zz a"), (11L, "a qq"), (12L, "a"))
      .toDF("doc_id", "t")
    val tr = LangModel.kneserNeyBigramNll(test, model, "doc_id", col("t"))
      .orderBy("doc_id").collect()
    val expCb = -math.log((0.0 + (0.75 * n1p("c")) * (dl("b") / types)) / c1("c"))
    assert(math.abs(tr(0).getDouble(2) - expCb) < 1e-12)
    val expZa = -math.log(dl("a") / types)
    assert(math.abs(tr(1).getDouble(2) - expZa) < 1e-12)
    val expAq = -math.log((0.0 + (0.75 * n1p("a")) * (1.0 / types)) / c1("a"))
    assert(math.abs(tr(2).getDouble(2) - expAq) < 1e-12)
    // single-token doc: no bigrams, null score
    assert(tr(3).getInt(1) == 0 && tr(3).isNullAt(2))
  }

  test("zipfFit: exact power-law corpus recovers slope -1") {
    // frequencies 12, 6, 4, 3 = 12/r for ranks 1..4 -> ln f = ln 12 - ln r,
    // an exact line of slope -1 through every point
    val words = Seq("aa" -> 12, "bb" -> 6, "cc" -> 4, "dd" -> 3)
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val got = LangModel.zipfFit(Seq(("s1", text)).toDF("source", "text"),
      "source", col("text")).collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 4)
    assert(math.abs(got(0).getAs[Double]("zipf_slope_r") + 1.0) < 1e-5)
  }

  test("zipfFit: single-term group has zero rank variance -> null slope") {
    val got = LangModel.zipfFit(
      Seq(("s1", "only only only")).toDF("source", "text"),
      "source", col("text")).collect()
    assert(got(0).getLong(1) == 1 && got(0).isNullAt(6))
  }

  test("markovChainNll: hand-checked MLE transitions; single-event group null") {
    val ev = Seq(
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "A"), (1L, 40L, "B"),
      (2L, 10L, "A"), (2L, 20L, "A"),
      (3L, 10L, "Z")
    ).toDF("user_id", "ts", "event_type")
    val got = LangModel.markovChainNll(ev, "user_id", Seq(col("ts")),
        col("event_type"))
      .orderBy("user_id").collect()
    // transitions: u1 (A,B)(B,A)(A,B), u2 (A,A); counts (A,B)=2 (B,A)=1
    // (A,A)=1; marginals A=3, B=1
    val nll1 = -(math.log(2.0 / 3) + math.log(1.0) + math.log(2.0 / 3)) / 3
    val nll2 = -math.log(1.0 / 3)
    assert(got(0).getInt(1) == 3 && math.abs(got(0).getDouble(2) - nll1) < 1e-12)
    assert(got(1).getInt(1) == 1 && math.abs(got(1).getDouble(2) - nll2) < 1e-12)
    assert(got(2).getInt(1) == 0 && got(2).isNullAt(2))
  }

  test("mooreLewisScore: in-domain-looking docs score positive, background negative") {
    // domain docs dominated by 'spark'; background dominated by 'cat'
    val docs = Seq(
      (0L, "spark spark query spark", "dom"),
      (1L, "spark query spark plan", "dom"),
      (2L, "cat dog cat bird cat", "gen"),
      (3L, "cat dog bird dog cat", "gen"),
      (4L, "spark spark spark query", "gen"), // domain-looking background doc
      (5L, "", "gen")
    ).toDF("doc_id", "text", "kind")
    val got = LangModel.mooreLewisScore(docs, "doc_id", col("text"),
        inDomain = col("kind") === "dom")
      .orderBy("doc_id").collect()
    // domain docs and the domain-looking background doc are kept
    assert(got(0).getAs[Boolean]("keep") && got(1).getAs[Boolean]("keep"))
    assert(got(4).getAs[Boolean]("keep"))
    // pure-background docs rejected
    assert(!got(2).getAs[Boolean]("keep") && !got(3).getAs[Boolean]("keep"))
    // token-less doc: zero tokens, null scores, null keep
    assert(got(5).getAs[Int]("n_tokens") == 0)
    assert(got(5).isNullAt(got(5).fieldIndex("ml_r")))
    assert(got(5).isNullAt(got(5).fieldIndex("keep")))
    // hand-check doc 0: every token in-domain; verify sign via raw counts
    // in-domain: spark=5, query=2, plan=1 (total 8); general adds cat=5,
    // dog=3, bird=2 (total 18). For 'spark': -ln(5/8) < -ln(8/18)? NLLs
    // per token are lower under the domain model for domain words.
    val ml0 = got(0).getAs[Double]("ml_r")
    assert(ml0 > 0.0)
  }

  test("termClassChi2: hand-derived contingency, sign, and null margin") {
    val docs = Seq(
      (1L, "cat dog", true), (2L, "cat fish", true),
      (3L, "dog dog fish", false), (4L, "bird fish", false))
      .toDF("id", "text", "en")
    val out = LangModel.termClassChi2(docs, "id", col("text"), col("en"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), Option(r.get(6)).map(_.asInstanceOf[Double]))))
      .toMap
    // cat: in both class docs, neither non-class doc -> perfect assoc
    assert(out("cat") === ((2L, 0L, 0L, 2L, 4L, Some(4.0))))
    // dog: one of each class; repeated "dog dog" counts once (presence)
    assert(out("dog")._1 === 1L && out("dog")._2 === 1L)
    assert(out("dog")._5 === 0L && out("dog")._6 === Some(0.0))
    // fish: present in 3 docs (1 class, 2 non): admbc = 1*0 - 2*1 = -2
    assert(out("fish") === ((1L, 2L, 1L, 0L, -2L, Some(4.0 * 4 / 12))))
    // a term in EVERY doc has an empty absent-margin -> chi2 NULL
    val all = Seq((1L, "x a", true), (2L, "x b", false))
      .toDF("id", "text", "en")
    val out2 = LangModel.termClassChi2(all, "id", col("text"), col("en"))
      .collect().map(r => r.getString(0) -> r.isNullAt(6)).toMap
    assert(out2("x") === true && out2("a") === false)
  }

  test("skipGramPairs: thr=1 keeps all (plain windowed pairs); subsampling thins hot words") {
    val docs = Seq((1L, "a b c")).toDF("id", "text")
    // thr = 1.0 -> kp = round(1e6*sqrt(T/cnt)) >= 1e6 -> keep everything
    val all = LangModel.skipGramPairs(docs, "id", col("text"),
        window = 1, thrPpm = 1000000L, seed = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(all === Map(("a", "b") -> 1L, ("b", "a") -> 1L,
      ("c", "b") -> 1L, ("b", "c") -> 1L))

    // a corpus dominated by "the": aggressive thr drops most of its
    // occurrences, so pairs involving it shrink vs the keep-all run
    val hot = (0L until 50L)
      .map(i => (i, s"the w$i the x$i the")).toDF("id", "text")
    def hotPairs(thr: Long): Long =
      LangModel.skipGramPairs(hot, "id", col("text"), window = 2,
          thrPpm = thr, seed = 1L)
        .where(col("center") === "the").agg(sum("n_pairs")).head.getLong(0)
    val full = hotPairs(1000000L)
    val thinned = LangModel.skipGramPairs(hot, "id", col("text"),
        window = 2, thrPpm = 1000L, seed = 1L)
      .where(col("center") === "the")
      .agg(coalesce(sum("n_pairs"), lit(0L))).head.getLong(0)
    assert(thinned < full / 2, s"expected < ${full / 2}, got $thinned")

    // deterministic across layouts
    val a = LangModel.skipGramPairs(hot, "id", col("text"), 2, 1000L, 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val b = LangModel.skipGramPairs(hot.repartition(7), "id", col("text"),
        2, 1000L, 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("wordVectors: topic clusters separate, deterministic, vocab guard") {
    val docs = ((0 until 30).map(i => (i.toLong, "cat dog pet")) ++
      (30 until 60).map(i => (i.toLong, "car road drive")))
      .toDF("id", "text")
    val vecs = LangModel.wordVectors(docs, "id", col("text"),
        window = 2, dim = 3, minCount = 1L)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap
    assert(vecs.keySet === Set("cat", "dog", "pet", "car", "road", "drive"))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(cos(vecs("cat"), vecs("dog")) > cos(vecs("cat"), vecs("car")) + 0.3)
    assert(cos(vecs("car"), vecs("road")) > cos(vecs("road"), vecs("pet")) + 0.3)
    // deterministic across layouts
    val again = LangModel.wordVectors(docs.repartition(7), "id",
        col("text"), window = 2, dim = 3, minCount = 1L)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap
    for (w <- vecs.keys) assert(vecs(w).toSeq === again(w).toSeq)
    // vocab guard refuses loudly
    intercept[IllegalArgumentException] {
      LangModel.wordVectors(docs, "id", col("text"),
        window = 2, dim = 2, minCount = 1L, maxVocab = 3)
    }
  }

  test("cooccurrencePmi: hand counts, window truncation, symmetric marginals") {
    val docs = Seq((1L, "a b c")).toDF("id", "text")
    val out = LangModel.cooccurrencePmi(docs, "id", col("text"),
        window = 2, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // position pairs (0,1),(0,2),(1,2) -> 6 directed; every c_ab = 1,
    // every marginal = 2, T = 6 -> pmi = ln(1.5) for all pairs
    assert(out.size === 6)
    val ppb = math.round(1e9 * math.log(1.5))
    for ((_, (c, ma, mb, t, p)) <- out)
      assert((c, ma, mb, t, p) === ((1L, 2L, 2L, 6L, ppb)))
    // both directions present
    assert(out.contains(("a", "b")) && out.contains(("b", "a")))

    // tokens farther than the window never pair
    val far = Seq((1L, "a x y z b")).toDF("id", "text")
    val pairs = LangModel.cooccurrencePmi(far, "id", col("text"),
        window = 2, minCount = 1L)
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1)))
    assert(!pairs.contains(("a", "b")))

    // repeated tokens: self-pairs count like any pair
    val rep = Seq((1L, "a a")).toDF("id", "text")
    val selfP = LangModel.cooccurrencePmi(rep, "id", col("text"),
        window = 1, minCount = 1L).collect()
    assert(selfP.length === 1) // (a,a) both directions collapse to one key
    assert(selfP.head.getLong(2) === 2L) // ...with directed count 2
  }

  test("collocationsLlr: hand contingency, association ranks above chance") {
    // corpus engineered so "x y" is a strong collocation and "p q" is
    // near-independent filler
    val strong = Seq.fill(10)("x y").mkString(" ")
    val noise = Seq.tabulate(40)(i =>
      Seq("p", "q", "r", "s")((i * 7) % 4)).mkString(" ")
    val docs = Seq(strong, noise, noise).toDF("text")
    val got = LangModel.collocationsLlr(docs, col("text"), minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    // reference computation straight from the Dunning formula
    got.foreach { case ((w1, w2), (n12, rr, cc, nn, llr)) =>
      def term(k: Long, row: Long, colS: Long): Long =
        if (k <= 0) 0L
        else math.round(1e9 * k.toDouble *
          math.log((k.toDouble * nn.toDouble) /
            (row.toDouble * colS.toDouble)))
      val expect = 2L * (term(n12, rr, cc) + term(rr - n12, rr, nn - cc) +
        term(cc - n12, nn - rr, cc) +
        term(nn - rr - cc + n12, nn - rr, nn - cc))
      assert(llr === expect, s"($w1,$w2)")
    }
    // every surviving pair here is a genuine association (the filler
    // cycle is deterministic): LLR strictly positive throughout, and
    // the x->y pair scores as the formula says it should
    assert(got(("x", "y"))._5 > 0)
    assert(got.values.forall(_._5 > 0))
  }

  test("collocationsLlr: marginals stay unfiltered under minCount") {
    val docs = Seq("a b a b a b a c").toDF("text")
    // bigrams: ab×3, ba×3, ac×1 -> N=7; minCount=3 keeps ab and ba but
    // ac still counts in a's row marginal and the total
    val rows = LangModel.collocationsLlr(docs, col("text"), minCount = 3)
      .orderBy("w1", "w2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      ("a", "b", 3L, 4L, 3L, 7L), // rr(a) = ab×3 + ac×1
      ("b", "a", 3L, 3L, 3L, 7L)))
  }

}
