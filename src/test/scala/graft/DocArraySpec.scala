package graft

import org.apache.spark.sql.functions._

/** Facade behavior: reference-style call sites compose end-to-end. */
class DocArraySpec extends SparkSuite {
  import spark.implicits._

  private lazy val da = DocArray(
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumnRenamed("vec_id", "id"))

  test("find(filter) → find(vectors) chains lazily") {
    val filtered = da.find("""{"label": {"$gte": 5}}""")
    assert(filtered.count() > 0 && filtered.count() < da.count())
    val hits = filtered.find(filtered.df.limit(2), k = 3, excludeSelf = true)
    assert(hits.count() == 6)
  }

  test("matchWith attaches matches; evaluate computes relevance") {
    val q = DocArray(da.df.where($"id" < 5))
    val matched = q.matchWith(da, k = 3, excludeSelf = true)
    assert(matched.df.columns.contains("matches"))
    assert(matched.count() == 5)
  }

  test("indexing, update, delete, extend, reduce") {
    val docs = DocArray(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text"))
    assert(docs(Seq(1L, 2L)).count() == 2)
    assert(docs.delete(Seq(2L)).count() == 2)
    assert(docs.extend(docs).count() == 6)
    val upd = docs.update(Seq((3L, "C")).toDF("id", "text"))
    assert(upd.df.where($"text" === "C").count() == 1)
    val merged = docs.reduce(DocArray(Seq((4L, "d")).toDF("id", "text")))
    assert(merged.count() == 4)
  }

  test("mapRows / mapBatch / embed through the facade") {
    import org.apache.spark.sql.Row
    val docs = DocArray(Seq((1L, "ab"), (2L, "cde"), (3L, "f")).toDF("id", "text"))
    val upper = docs.mapRows(r => Row(r.getLong(0), r.getString(1).toUpperCase))
    assert(upper.df.orderBy("id").select("text").as[String].collect().toSeq
      == Seq("AB", "CDE", "F"))
    val batched = docs.mapBatch(2)(b => b.iterator) // identity in batches
    assert(batched.count() == 3)
    // embed: "model" = char-count one-hot-ish scorer, batch-applied
    val emb = docs.embed(2)(b => b.map(r => Array(r.getString(1).length.toFloat)))
    val got = emb.df.orderBy("id").select("embedding")
      .as[Seq[Float]].collect().map(_.head)
    assert(got.toSeq == Seq(2.0f, 3.0f, 1.0f))
    assert(emb.df.schema("embedding").dataType.typeName == "array")
  }

  test("text search + vocabulary + sample through the facade") {
    val docs = DocArray(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("doc_id", "id"))
    assert(docs.findText("spark table").count() > 0)
    assert(docs.vocabulary(minFreq = 50).count() > 0)
    assert(docs.sample(7, seed = 3).count() == 7)
    assert(docs.summary().count() > 0)
  }

  test("write-back and URI fetch through the facade") {
    val nested = Seq(("r1", "t")).toDF("id", "text")
      .withColumn("chunks", array(struct(lit("c1").as("id"), lit("old").as("text"))))
    val da = DocArray(nested)
    val back = da.setByPath("@c", Seq(("c1", "new")).toDF("id", "text"))
    assert(back.traverse("c").df.select("text").as[String].collect()(0) == "new")
    val fetched = DocArray(Seq(("x", "data:text/plain;base64,aGk=")).toDF("id", "uri"))
      .loadUriToBlob()
    assert(new String(fetched.df.select("blob").collect()(0)
      .getAs[Array[Byte]](0), "UTF-8") == "hi")
  }

  test("pca / distinctEstimate / kneserNeyScore / blocklistFilter facades") {
    val projected = da.pca(2).df
    assert(projected.columns.contains("pca"))
    assert(projected.select(size(col("pca"))).distinct().head.getInt(0) == 2)

    val docs = DocArray(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("doc_id", "id"))
    val est = docs.distinctEstimate(col("text"), Seq("source"), k = 8)
    assert(est.columns.toSet ==
      Set("source", "k_actual", "kth_hash", "est_distinct"))
    assert(est.count() > 0)

    val kn = docs.kneserNeyScore().df
    assert(kn.columns.contains("nll_kn"))
    assert(kn.where(col("nll_kn").isNotNull).count() > 0)

    val bl = docs.blocklistFilter(Seq("zzznotaword")).df
    assert(bl.where(col("keep")).count() == docs.count()) // nothing blocked
  }

  test("fuzzyDedupPairs / selectLikeDomain / zipfSlopes / signalCorrelations facades") {
    val docs = DocArray(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("doc_id", "id"))

    val fz = docs.fuzzyDedupPairs(maxRatioPct = 10)
    assert(fz.columns.toSet == Set("a", "b", "dist", "len_a", "len_b"))
    assert(fz.count() > 0)

    val ml = docs.selectLikeDomain(col("lang") === "en")
    assert(ml.columns.contains("ml_r") && ml.columns.contains("keep"))
    assert(ml.where(col("keep")).count() > 0)

    val zs = docs.zipfSlopes("source")
    assert(zs.where(col("zipf_slope_r") < 0).count() > 0) // freq falls with rank

    val corr = docs.signalCorrelations(
      "len" -> length(col("text")), "nc" -> col("n_chars"))
    assert(corr.where(col("sig_i") === "len" && col("sig_j") === "len")
      .head.getAs[Double]("corr_r") == 1.0)
  }

  test("findDiverse facade: diverse top-k over the embeddings table") {
    val emb = DocArray(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumnRenamed("vec_id", "id"))
    val queries = emb.df.where(col("id") < 3)
    val got = emb.where(col("id") >= 3)
      .findDiverse(queries, k = 3, fetchK = 10)
    assert(got.groupBy("query_id").count().count() == 3)
    assert(got.count() == 9)
    // ranks are 1..3 per query, docs distinct within a query
    assert(got.where(col("rank") > 3 || col("rank") < 1).count() == 0)
    assert(got.select("query_id", "doc_id").distinct().count() == 9)
  }

  test("outlierScores / dbscan / domainSimilarity / conformalWith facades") {
    val emb = DocArray(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumnRenamed("vec_id", "id"))

    val os = emb.outlierScores(k = 5)
    assert(os.columns.toSet ==
      Set("query_id", "kth_distance", "mean_distance"))
    assert(os.count() == emb.count()) // every vector scored

    val proj = emb.pca(2).df
      .select(col("id"), element_at(col("pca"), 1).as("x"),
        element_at(col("pca"), 2).as("y"))
    val db = DocArray(proj).dbscan("x", "y", eps = 0.5, minPts = 3)
    assert(db.columns.toSet == Set("id", "kind", "cluster_id"))
    assert(db.count() == emb.count())

    val sim = emb.domainSimilarity("label")
    assert(sim.count() == 45) // C(10,2) label pairs
    assert(sim.where(abs(col("cos")) > 1.0000001).count() == 0)

    val cal = emb.where(col("id") % 2 === 0)
    val ev = emb.where(col("id") % 2 =!= 0)
    val cf = ev.conformalWith(cal,
      element_at(col("embedding"), 1) * 1000, 1, 10).head
    assert(cf.getAs[Long]("n_cal") > 0 && cf.getAs[Long]("n_eval") > 0)
    assert(cf.getAs[Double]("coverage") >= 0.8) // ~1-alpha by construction
  }

  test("coreset / driftW1 / driftPsi / calibrationError facades") {
    val emb = DocArray(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumnRenamed("vec_id", "id"))
    val cs = emb.coreset(4)
    assert(cs.count() == 4 &&
      cs.columns.toSeq == Seq("sel_order", "id", "d2_sel"))

    val docs = DocArray(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("doc_id", "id"))
    val en = docs.where(col("lang") === "en")
    val rest = docs.where(col("lang") =!= "en")
    val w1 = en.driftW1(rest, col("n_chars")).head
    assert(w1.getAs[Long]("n1") > 0 && !w1.isNullAt(3))

    val psi = en.driftPsi(rest, length(col("text")) / 10000.0)
    assert(psi.count() == 10)

    val ece = docs.calibrationError(length(col("text")) / 10000.0,
      col("lang") =!= "en").head
    assert(ece.getAs[Long]("n") == docs.count())
  }

  test("phrase / proximity / bagDedup / mutual-knn / privacy / percentile facades") {
    val docs = DocArray(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("doc_id", "id"))
    val ph = docs.findPhrase("table table")
    assert(ph.columns.toSeq === Seq("id", "pos") && ph.count() > 0)
    val nr = docs.findNear("spark", "vector", window = 3)
    assert(nr.columns.toSeq === Seq("id", "pos_a", "pos_b"))
    val bd = docs.bagDedup()
    assert(bd.columns.toSeq === Seq("bag_fp", "keep_id", "n_copies"))
    assert(bd.agg(sum("n_copies")).head.getLong(0) === docs.count())
    val ka = docs.kAnonymityProfile(Seq("lang", "source"), k = 5,
      sensitiveCol = Some("n_chars"))
    assert(ka.columns.toSeq ===
      Seq("lang", "source", "n", "n_sensitive", "at_risk"))
    val pr = docs.percentileRank(Seq("source"), col("n_chars"))
    assert(pr.columns.contains("pct_ppm") &&
      pr.agg(max("pct_ppm")).head.getLong(0) === 1000000L)

    val emb = DocArray(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumnRenamed("vec_id", "id"))
    val mp = emb.mutualNearDupPairs(k = 3, metric = "euclidean")
    assert(mp.columns.toSeq ===
      Seq("a", "b", "rank_ab", "rank_ba", "distance"))
    assert(mp.where(col("a") >= col("b")).count() === 0L)
  }

  test("topicModel / heavyTokens facades") {
    val docs = DocArray(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("doc_id", "id"))
    val m = docs.topicModel(k = 3)
    assert(m.phi.select("z").distinct().count() == 3)
    assert(m.theta.columns.toSeq == Seq("d", "z", "t"))
    val hh = docs.heavyTokens(k = 30)
    assert(hh.count() > 0 &&
      hh.columns.toSeq == Seq("key", "cnt", "n_total"))
  }

  test("linkPredict / kCoreOf / bootstrapSe facades") {
    import spark.implicits._
    val docs = DocArray(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("doc_id", "id"))
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val lp = docs.linkPredict(pairs)
    assert(lp.columns.toSeq == Seq("a", "b", "cn", "aa_ppb"))
    assert(lp.count() > 0)
    val kc = docs.kCoreOf(pairs, k = 2, rounds = 2)
    assert(kc.columns.toSeq == Seq("node", "degree"))
    assert(kc.count() == 3) // the triangle survives, node 4 peels
    val se = docs.bootstrapSe(length(col("text")).cast("long"), reps = 8)
    assert(se.columns.toSeq == Seq("b_used", "grand_mean", "se_boot"))
    assert(se.head.getAs[Long]("b_used") == 8L)
  }

  test("drift / agreement / concentration / stemmed-search facades") {
    import spark.implicits._
    val docs = DocArray(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("doc_id", "id"))
    val rs = docs.rankSumDrift(col("lang") === "en", length(col("text")))
    assert(rs.columns.toSeq ==
      Seq("n1", "n2", "r1x2", "tie_cube", "u1x2", "z"))
    assert(rs.head.getLong(0) > 0L)
    val kw = docs.rankDriftByGroup(col("lang"), length(col("text")))
    assert(kw.columns.toSeq == Seq("n", "k", "tie_cube", "h", "h_c"))
    assert(kw.head.getLong(1) >= 2L)
    val ag = docs.agreement(col("lang"), col("lang"))
    assert(ag.head.getDouble(4) === 1.0) // self-agreement is perfect
    val fd = docs.filterDisagreement(length(col("text")) > 50,
      length(col("text")) > 200)
    assert(fd.columns.toSeq == Seq("n", "n11", "n10", "n01", "n00", "chi2"))
    val gn = docs.concentration(Seq("source"), col("id"),
      length(col("text")).cast("long"))
    assert(gn.count() > 0 && gn.columns.contains("gini"))
    val st = docs.findTextStemmed("querying tables")
    assert(st.count() > 0) // inflected query only matches via stems
  }

  test("survivalSignificance / trendAcrossGroups / dependence / geoNearest / snapshotDiff facades") {
    val docs = DocArray(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("doc_id", "id"))

    val lr = docs.survivalSignificance(col("n_chars") % 20,
      lit(1L), col("id") % 2 === 0)
    assert(lr.columns.contains("z") && lr.count() == 1)

    val tr = docs.trendAcrossGroups(col("id") % 3, col("n_chars"))
    assert(tr.columns.toSeq ==
      Seq("k", "n", "j2", "e2", "var_j", "z") && tr.count() == 1)

    val dep = docs.dependence(col("lang"), col("source"))
    assert(dep.head.getLong(2) >= 0L) // MI of real columns, non-negative

    val pts = DocArray(docs.df.select(col("id"),
      (col("id") % 100 - 50).cast("double").as("la"),
      (col("id") % 300 - 150).cast("double").as("lo")))
    val gn = pts.geoNearest(pts, "la", "lo", radiusKm = 500.0, k = 2)
    assert(gn.columns.toSeq ==
      Seq("left_id", "right_id", "dist_km", "rank") && gn.count() > 0)

    val prev = DocArray(docs.df.where(col("id") % 2 === 0))
    val sd = docs.snapshotDiff(prev, col("text"))
    val statuses = sd.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statuses.contains("added") && statuses.contains("unchanged"))
  }

  test("scriptComposition / clusterTerms / robustScores / expect facades") {
    val docs = DocArray(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("doc_id", "id"))

    val sc = docs.scriptComposition()
    assert(sc.columns.contains("scripts") &&
      sc.where(col("scripts.n") > 0).count() > 0)

    val ct = docs.clusterTerms(col("source"), topK = 3)
    assert(ct.columns.toSeq ==
      Seq("cluster", "term", "tf", "idf_ppb", "rank"))
    assert(ct.groupBy("cluster").count().collect().forall(_.getLong(1) <= 3))

    val rz = docs.robustScores(Seq("lang"), col("n_chars"))
    assert(rz.columns.contains("z") && rz.count() > 0)

    val ex = docs.expect(
      "has_text" -> col("text").isNotNull,
      "len_sane" -> (col("n_chars") < 100000L))
    assert(ex.count() == 2 &&
      ex.where(col("rule") === "len_sane").head.getLong(2) == 0L)
  }

  test("r7 facades: sessionize / spellCorrect / substringCounts / isotonic / smoothFeature") {
    val ev = DocArray(Seq((1L, 0L, "a"), (1L, 500L, "b"), (2L, 9L, "a"))
      .toDF("u", "ts", "t"), idCol = "u")
    assert(ev.sessionize("u", "ts", "t", gapNs = 100L).count() == 3)

    val vocab = Seq(("hello", 5L), ("help", 9L)).toDF("word", "freq")
    val toks = DocArray(Seq("helo", "hel").toDF("tok"), idCol = "tok")
    val sc = toks.spellCorrect("tok", vocab)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // "helo" is distance 1 from BOTH (insert l / sub o->p): freq picks help
    assert(sc("helo") == "help" && sc("hel") == "help")

    val docs = DocArray(Seq((1L, "abc abc"), (2L, "xyz"))
      .toDF("id", "text"))
    val cnt = docs.substringCounts(Seq("abc", "q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(cnt(1L) == Seq(2L, 0L) && cnt(2L) == Seq(0L, 0L))

    val scored = DocArray(Seq((1L, 0.1, false), (2L, 0.9, true))
      .toDF("id", "s", "y"))
    val iso = scored.isotonic(col("s"), col("y"))
    assert(iso.count() == 2 &&
      iso.orderBy("bucket").collect().map(_.getDouble(5)).toSeq ==
        Seq(0.0, 1.0))

    val nodes = DocArray(Seq((1L, 1000000L), (2L, 3000000L))
      .toDF("id", "f"))
    val sm = nodes.smoothFeature(Seq((1L, 2L)).toDF("a", "b"),
        col("f"), rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sm == Map(1L -> 3000000L, 2L -> 1000000L))
  }

  test("randomWalks facade symmetrizes an undirected a<b pair table") {
    // path 0-1-2: canonical pairs only go upward; without the facade's
    // symmetrization a walk from 2 could never move (2 would be a sink)
    val nodes = DocArray(Seq(0L, 1L, 2L).toDF("id"))
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("a", "b")
    val walks = nodes.randomWalks(pairs, walksPerNode = 1, walkLength = 2)
    // every start (incl. node 2) emits step-1 rows: no artificial sinks
    val starts = walks.where(col("step") === 1)
      .select("start").distinct().as[Long].collect().sorted
    assert(starts.toSeq == Seq(0L, 1L, 2L))
    // node 2's first hop must be its only undirected neighbor, 1
    val hop2 = walks.where(col("start") === 2L && col("step") === 1)
      .select("node").as[Long].collect()
    assert(hop2.nonEmpty && hop2.forall(_ == 1L))
  }
}
