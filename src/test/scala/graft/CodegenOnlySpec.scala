package graft

import org.apache.spark.sql.functions.{col, lit}

import graft.functions._

/** r8 gate for the CodegenFallback purge: run every converted kernel
  * expression under `spark.sql.codegen.factoryMode=CODEGEN_ONLY` +
  * `spark.sql.codegen.fallback=false` and diff against the forced
  * interpreted (`NO_CODEGEN`) results. Without this spec a Janino
  * compile error in a `doGenCode` would SILENTLY fall back to
  * interpreted eval — every functional spec would stay green while the
  * whole-stage-codegen claim quietly became false. Here a codegen
  * failure throws, and a codegen/interpreted divergence fails the diff. */
class CodegenOnlySpec extends SparkSuite {
  import spark.implicits._

  private def withMode[T](mode: String, fallback: Boolean)(f: => T): T = {
    val fm = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val fb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    spark.conf.set("spark.sql.codegen.fallback", fallback.toString)
    try f finally {
      fm.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(v =>
        spark.conf.set("spark.sql.codegen.factoryMode", v))
      fb.fold(spark.conf.unset("spark.sql.codegen.fallback"))(v =>
        spark.conf.set("spark.sql.codegen.fallback", v))
    }
  }

  test("all converted kernels: CODEGEN_ONLY result == NO_CODEGEN result") {
    val rows = Seq(
      ("The Quick brown-Fox jumps 42 times", "café naïve ÆØß",
        Seq("alpha", "beta", "alpha", "gamma"),
        Seq("the", "quick", "brown"),
        Seq(0.5f, -1.5f, 2.0f, 0.25f), Seq(1.0f, 0.0f, -1.0f, 3.0f),
        Seq(1L, 5L, 3L, 9L), Seq(2L, 4L, 8L),
        "running", "card 4111111111111111 end"),
      ("", "łódź żółć", Seq.empty[String], Seq("x"),
        Seq(0.0f, 0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f, 1.0f),
        Seq(7L), Seq(7L), "caresses", "no digits here"),
      ("aaa bbb aaa bbb ccc ddd eee fff ggg hhh", "ABC", Seq("z"),
        Seq("zz", "zz"), Seq(1.5f, 2.5f, -0.5f, 0.125f),
        Seq(-1.0f, 2.0f, 0.5f, 0.5f), Seq(10L, 20L, 30L), Seq(15L, 25L),
        "ponies", "4111111111111111 4111111111111112"))
      .toDF("text", "uni", "toks", "toks2", "vec", "vec2", "xs", "ys",
        "word", "cardy")
    val merges = Seq("a" -> "a", "aa" -> "a", "b" -> "b")
    val wpVocab = Seq("run", "##ning", "po", "##nies", "[UNK]")
    val ugVocab = Seq(("run", 1000000L), ("ning", 2000000L), ("s", 900000L))
    val out = rows.select(
      fnv64(col("text")).as("a1"),
      splitmix64_rank(col("xs").getItem(0), 7L).as("a2"),
      minhash_signature(col("toks"), 8).as("a3"),
      minhash_text(col("text"), 2, 8).as("a4"),
      text_ngrams(col("text"), 2).as("a5"),
      char_ngrams(col("text"), 3).as("a6"),
      simhash64(col("toks")).as("a7"),
      feature_hash(col("toks"), 16).as("a8"),
      rolling_fingerprint(col("text"), 4).as("a9"),
      cdc_chunks(col("text"), 4, 2).as("a10"),
      cosine_lsh(col("vec"), 4, 16).as("a11"),
      bpe_encode(col("text"), merges).as("a12"),
      bpe_encode_ids(col("text"), merges, Seq("a", "b", "c")).as("a13"),
      wordpiece_encode(col("toks2"), wpVocab).as("a14"),
      unigram_segment(col("word"), ugVocab).as("a15"),
      token_top_stats(col("text")).as("a15b"),
      gopher_aux_stats(col("text"), Seq("the", "of")).as("a15c"),
      band_hashes(minhash_text(col("text"), 2, 8), 4, 2).as("a15d"),
      porter_stem(col("word")).as("a16"),
      normalize_text(col("uni"), "NFC").as("a17"),
      strip_accents(col("uni")).as("a18"),
      redact_cards(col("cardy")).as("a19"),
      card_run_stats(col("cardy")).as("a20"),
      lcs_length(col("toks"), col("toks2")).as("a21"),
      dtw_distance(col("xs"), col("ys")).as("a22"),
      jaro_similarity(col("text"), col("uni")).as("a23"),
      jaro_winkler_similarity(col("word"), col("text")).as("a24"),
      damerau_levenshtein(col("word"), col("uni")).as("a25"),
      sq_encode(col("vec"), Seq(-2.0, -2.0, -2.0, -2.0),
        Seq(0.05, 0.05, 0.05, 0.05)).as("a26"),
      pq_encode(col("vec"), 2, Seq(
        Seq(Seq(0.0, 0.0), Seq(1.0, -1.0)),
        Seq(Seq(2.0, 0.0), Seq(0.0, 0.5)))).as("a27"),
      graft.operators.ZOrder.hvalue(8, col("xs").getItem(0),
        col("ys").getItem(0)).as("a28"),
      nearest_cells(col("vec").cast("array<double>"),
        Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(1.0, -1.0, 2.0, 0.0),
          Seq(0.5, -1.5, 2.0, 0.25)), Seq(7, 8, 9), 2).as("a29"))
    val gen = withMode("CODEGEN_ONLY", fallback = false) {
      out.toJSON.collect().toSeq
    }
    val interp = withMode("NO_CODEGEN", fallback = true) {
      out.toJSON.collect().toSeq
    }
    assert(gen == interp)
    // and the codegen run actually produced content, not empty rows
    assert(gen.size == 3 && gen.forall(_.contains("\"a1\"")))
  }

  test("vector/bit kernels (pre-r8 codegen set): CODEGEN_ONLY == NO_CODEGEN") {
    val df = Seq(
      (Seq(0.5f, -1.5f, 2.0f, 0.25f), Seq(1.0f, 0.0f, -1.0f, 3.0f),
        Seq(10L, -20L, 30L, -40L), "ab abab cab"),
      (Seq(1.0f, 1.0f, 1.0f, 1.0f), Seq(-1.0f, 2.0f, 0.5f, 0.5f),
        Seq(5L, 5L, 5L, 5L), "no hits"))
      .toDF("va", "vb", "ql", "txt")
    val out = df.select(
      vector_distance(col("va"), col("vb"), "cosine").as("b1"),
      vector_distance(col("va"), col("vb"), "euclidean").as("b2"),
      vector_distance(col("va"), col("vb"), "sqeuclidean").as("b3"),
      vector_distance(col("va"), col("vb"), "dot").as("b4"),
      l2_normalize(col("va")).as("b5"),
      sign_pack_words(col("va")).as("b6"),
      sign_pack_words(col("va"), Seq(100L, 200L, -100L, 0L), 2L).as("b7"),
      hamming_words(sign_pack_words(col("va")),
        sign_pack_words(col("vb"))).as("b8"),
      sign_project_long(col("ql"),
        Seq(Seq[Byte](1, -1, 1, -1), Seq[Byte](-1, -1, 1, 1))).as("b9"),
      project_vector(col("va"), Seq(0.0, 0.0, 0.0, 0.0),
        Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 0.5, 0.5, 0.0))).as("b10"),
      nearest_centroid(col("va"), Seq(3, 7),
        Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0, 1.0))).as("b11"),
      bit_length64(col("ql").getItem(0)).as("b12"),
      bytes_to_ints(col("txt").cast("binary")).as("b13"),
      substring_count_all(col("txt"), Seq("ab", "cab")).as("b14"),
      kmv_estimate(col("ql").getItem(0), 2).as("b15"))
    val gen = withMode("CODEGEN_ONLY", fallback = false) {
      out.toJSON.collect().toSeq
    }
    val interp = withMode("NO_CODEGEN", fallback = true) {
      out.toJSON.collect().toSeq
    }
    assert(gen == interp && gen.size == 2)
  }

  test("whole-stage codegen span: converted kernel rides a starred stage") {
    // the executedPlan marks codegen'd stages with '*'; a fallback
    // Project would print unstarred — lock the hot dedup scan shape.
    // spark.range (not a local Seq) so ConvertToLocalRelation can't
    // constant-fold the projection away before execution.
    val df = spark.range(4)
      .select(org.apache.spark.sql.functions.concat(lit("w "),
        col("id").cast("string")).as("text"))
      .select(minhash_text(col("text"), 1, 8).as("sig"),
        simhash64(org.apache.spark.sql.functions.split(col("text"), " "))
          .as("sh"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no whole-stage codegen stage:\n$plan")
    assert(!plan.toLowerCase.contains("fallback"), plan)
  }

  test("dtw_distance with NON-NULLABLE children compiles and nulls on " +
      "empty input (r8 regression: undeclared isNull var)") {
    import org.apache.spark.sql.functions.{sequence, slice, array}
    // sequence()/array(lit) children are non-nullable: without the
    // nullable=true override the generated code assigned to an
    // undeclared isNull variable and failed Janino compilation
    val df = spark.range(3).select(
      dtw_distance(sequence(lit(1L), col("id") + 1L),
        array(lit(2L), lit(3L))).as("d"),
      // empty left side (slice beyond range) must yield null, not 0
      dtw_distance(slice(sequence(lit(1L), lit(2L)), 3, 2),
        array(lit(2L))).as("e"))
    val gen = withMode("CODEGEN_ONLY", fallback = false) {
      df.toJSON.collect().toSeq
    }
    val interp = withMode("NO_CODEGEN", fallback = true) {
      df.toJSON.collect().toSeq
    }
    assert(gen == interp)
    assert(gen.forall(!_.contains("\"e\""))) // null e omitted from JSON
  }

  test("band_hashes over an array WITH null elements matches xxhash64 " +
      "null-skip semantics (r8 regression)") {
    import org.apache.spark.sql.functions.{sequence, transform, when => w}
    // build array<bigint> with a null at position 2 from a real scan
    val df = spark.range(2).select(
      transform(sequence(lit(0L), lit(7L)),
        x => w(x === 2L, lit(null).cast("long")).otherwise(x + col("id")))
        .as("sig"))
    val out = df.select(
      band_hashes(col("sig"), 2, 4, 42L).as("fast"),
      transform(sequence(lit(0), lit(1), lit(1)),
        b => org.apache.spark.sql.functions.xxhash64(lit(42L), b,
          org.apache.spark.sql.functions.slice(col("sig"), b * 4 + 1,
            lit(4)))).as("ref"))
    val gen = withMode("CODEGEN_ONLY", fallback = false) {
      out.collect().toSeq
    }
    gen.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("ml_vector_distance (VectorUDT sparse+dense): codegen == interpreted") {
    import org.apache.spark.ml.linalg.Vectors
    val df = Seq(
      (Vectors.dense(1.0, 0.0, 2.0),
        Vectors.sparse(3, Array(0, 2), Array(0.5, 1.5))),
      (Vectors.sparse(3, Array(1), Array(4.0)),
        Vectors.dense(0.0, 2.0, 0.0)))
      .toDF("va", "vb")
    val out = df.select(
      ml_vector_distance(col("va"), col("vb"), "cosine").as("c"),
      ml_vector_distance(col("va"), col("vb"), "euclidean").as("e"))
    val gen = withMode("CODEGEN_ONLY", fallback = false) {
      out.toJSON.collect().toSeq
    }
    val interp = withMode("NO_CODEGEN", fallback = true) {
      out.toJSON.collect().toSeq
    }
    assert(gen == interp && gen.size == 2)
  }
}
