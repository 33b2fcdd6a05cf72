package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Reduce / Evaluate / Traverse / Items / GroupOps semantics
  * (reference: tests/unit/array/mixins/test_reduce.py, test_traverse.py,
  * test_eval_class.py, test_advance_indexing.py, test_group.py). */
class OperatorsSpec extends SparkSuite {
  import spark.implicits._

  test("reduce merge: left priority, union of ids (reduce.py:7-91)") {
    val a = Seq((1L, "la", null.asInstanceOf[String]),
      (2L, "lb", "sa")).toDF("id", "text", "src")
    val b = Seq((2L, "rb", "sb"), (3L, "rc", "sc")).toDF("id", "text", "src")
    val got = Reduce.merge(a, b, "id").orderBy("id")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "la", null), (2L, "lb", "sa"), (3L, "rc", "sc")))
  }

  test("reduce merge: null left field filled from right") {
    val a = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    val b = Seq((1L, "filled")).toDF("id", "text")
    assert(Reduce.merge(a, b, "id").as[(Long, String)].collect()(0)._2 == "filled")
  }

  test("IR metrics known values (math/evaluation.py)") {
    val df = Seq((1, Seq(0, 1, 0, 1, 0))).toDF("id", "rel")
    val r = df.select(
      Evaluate.precisionAtK($"rel", 5).as("p5"),
      Evaluate.reciprocalRank($"rel").as("rr"),
      Evaluate.averagePrecision($"rel").as("ap"),
      Evaluate.hitAtK($"rel", 1).as("h1"),
      Evaluate.dcgAtK($"rel", 5).as("dcg"),
      Evaluate.ndcgAtK($"rel", 5).as("ndcg"),
      Evaluate.rPrecision($"rel").as("rp")).collect()(0)
    assert(math.abs(r.getAs[Double]("p5") - 0.4) < 1e-12)
    assert(math.abs(r.getAs[Double]("rr") - 0.5) < 1e-12)
    // AP = (1/2 + 2/4) / 2 = 0.5
    assert(math.abs(r.getAs[Double]("ap") - 0.5) < 1e-12)
    assert(r.getAs[Double]("h1") == 0.0)
    val dcgExp = 1.0 / (math.log(3) / math.log(2)) + 1.0 / (math.log(5) / math.log(2))
    assert(math.abs(r.getAs[Double]("dcg") - dcgExp) < 1e-9)
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2))
    assert(math.abs(r.getAs[Double]("ndcg") - dcgExp / idcg) < 1e-9)
    // r-precision: R=2 → first 2 entries contain 1 relevant → 0.5
    assert(math.abs(r.getAs[Double]("rp") - 0.5) < 1e-12)
  }

  test("nest: depth-as-data re-nest, payload order, childless parents drop") {
    val roots = Seq("A", "B", "Z").toDF("id") // Z has no children -> drops
    val mids = Seq(("A1", "A", 5L), ("A2", "A", 6L), ("B1", "B", 7L))
      .toDF("id", "pid", "w")
    val leaves = Seq(("L2", "A2", 20L), ("L1", "A1", 10L),
      ("L3", "A1", 30L)).toDF("id", "pid", "q")
    val nested = Traverse.nest(Seq(roots, mids, leaves),
      idCol = "id", parentCol = "pid")
    // B1 has no leaves -> B drops with it (inner joins all the way down)
    assert(nested.select("id").as[String].collect().toSeq == Seq("A"))
    // traverse back out through the generic walker: leaf ids in struct
    // (id-sorted) order per parent
    val back = Traverse.traverse(nested, "cc")
      .select("id", "q").as[(String, Long)].collect().toSeq.sorted
    assert(back == Seq(("L1", 10L), ("L2", 20L), ("L3", 30L)))
    // mid-level payload rides into the structs
    val mid = Traverse.traverse(nested, "c").select("id", "w")
      .as[(String, Long)].collect().toSeq.sorted
    assert(mid == Seq(("A1", 5L), ("A2", 6L)))
    // depth is data: the same call shape handles a 2-level list
    val two = Traverse.nest(Seq(mids.select("id"), leaves), "id", "pid")
    assert(two.count() == 2) // A1, A2 (B1 childless)
  }

  test("traverse paths and flatten (traverse.py)") {
    val docs = Seq(
      ("r1", "root one"), ("r2", "root two")
    ).toDF("id", "text")
      .withColumn("chunks", array(
        struct(concat($"id", lit("-c0")).as("id"), $"id".as("parent_id"),
          lit(1).as("granularity"), lit("chunk0").as("text")),
        struct(concat($"id", lit("-c1")).as("id"), $"id".as("parent_id"),
          lit(1).as("granularity"), lit("chunk1").as("text"))))

    assert(Traverse.traverse(docs, "r").count() == 2)
    val c = Traverse.traverse(docs, "c")
    assert(c.count() == 4)
    assert(c.columns.toSet == Set("id", "parent_id", "granularity", "text"))
    val sliced = Traverse.traverse(docs, "c[0:1]")
    assert(sliced.count() == 2)
    assert(sliced.select("text").as[String].collect().forall(_ == "chunk0"))
    val flat = Traverse.flatten(docs, depth = 1)
    assert(flat.count() == 6)
    assert(flat.select("id").distinct().count() == 6)
  }

  test("setByPath: write-back via @c rebuilds chunks, order and schema kept") {
    val docs = Seq(("r1", "root one"), ("r2", "root two"), ("r3", "no kids"))
      .toDF("id", "text")
      .withColumn("chunks", when($"id" =!= "r3", array(
        struct(concat($"id", lit("-c0")).as("id"), $"id".as("parent_id"),
          lit("chunk0").as("text")),
        struct(concat($"id", lit("-c1")).as("id"), $"id".as("parent_id"),
          lit("chunk1").as("text"))))
        .otherwise(array().cast("array<struct<id:string,parent_id:string,text:string>>")))
    // modify ALL @c leaves: uppercase the text
    val updates = Traverse.traverse(docs, "c")
      .withColumn("text", upper($"text"))
    val back = Traverse.setByPath(docs, "@c", updates)
    assert(back.schema.catalogString == docs.schema.catalogString)
    val texts = back.orderBy("id")
      .select(flatten(array($"chunks.text")).as("t")).as[Seq[String]].collect()
    assert(texts(0) == Seq("CHUNK0", "CHUNK1"))
    assert(texts(1) == Seq("CHUNK0", "CHUNK1"))
    assert(texts(2) == Seq())
    // partial update: only r1-c1 replaced, siblings untouched, order kept
    val one = Seq(("r1-c1", "r1", "patched")).toDF("id", "parent_id", "text")
    val t2 = Traverse.setByPath(docs, "@c", one).orderBy("id")
      .select(flatten(array($"chunks.text")).as("t")).as[Seq[String]].collect()
    assert(t2(0) == Seq("chunk0", "patched") && t2(1) == Seq("chunk0", "chunk1"))
    // two-level path @cm
    val deep = Seq(("r1", "root")).toDF("id", "text")
      .withColumn("chunks", array(struct(
        lit("c1").as("id"), lit("r1").as("parent_id"), lit("ct").as("text"),
        array(struct(lit("m1").as("id"), lit("match-of-chunk").as("text")))
          .as("matches"))))
    val mUpd = Seq(("m1", "MATCHED")).toDF("id", "text")
    val got = Traverse.setByPath(deep, "@cm", mUpd)
    assert(got.schema.catalogString == deep.schema.catalogString)
    assert(Traverse.traverse(got, "cm").select("text").as[String].collect()(0)
      == "MATCHED")
  }

  test("setByPath: chunks with map-typed fields (tags) still write back") {
    // full-schema docs carry map columns (tags, scores, …) that Spark
    // cannot order — the position sort must not order the whole struct
    val docs = Seq(("r1", "one"), ("r2", "two")).toDF("id", "text")
      .withColumn("chunks", array(
        struct(concat($"id", lit("-c0")).as("id"), $"id".as("parent_id"),
          lit("chunk0").as("text"), map(lit("k"), lit("v0")).as("tags")),
        struct(concat($"id", lit("-c1")).as("id"), $"id".as("parent_id"),
          lit("chunk1").as("text"), map(lit("k"), lit("v1")).as("tags"))))
    val updates = Traverse.traverse(docs, "c").withColumn("text", upper($"text"))
    val back = Traverse.setByPath(docs, "@c", updates)
    assert(back.schema.catalogString == docs.schema.catalogString)
    val got = back.orderBy("id")
      .select(flatten(array($"chunks.text")).as("t")).as[Seq[String]].collect()
    assert(got.forall(_ == Seq("CHUNK0", "CHUNK1")))
    // map payloads survive the rebuild, chunk order kept
    val tags = back.orderBy("id")
      .select($"chunks.tags".getItem(0).getItem("k").as("t0"),
        $"chunks.tags".getItem(1).getItem("k").as("t1"))
      .as[(String, String)].collect()
    assert(tags.forall(_ == ("v0", "v1")))
  }

  test("traverse chained paths: cm reaches matches of chunks") {
    val docs = Seq(("r1", "root")).toDF("id", "text")
      .withColumn("chunks", array(struct(
        lit("c1").as("id"), lit("r1").as("parent_id"), lit("ct").as("text"),
        array(struct(lit("m1").as("id"), lit("match-of-chunk").as("text")))
          .as("matches"))))
    val cm = Traverse.traverse(docs, "cm")
    assert(cm.count() == 1)
    assert(cm.select("text").as[String].collect()(0) == "match-of-chunk")
  }

  test("traverseFlat unions multiple paths") {
    val docs = Seq(("r1", "t")).toDF("id", "text")
      .withColumn("chunks", array(struct(lit("c1").as("id"), lit("ct").as("text"))))
    val got = Traverse.traverseFlat(docs, "r,c")
    assert(got.count() == 2)
  }

  test("items: updateById coalesces new over old (setitem.py)") {
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "text", "w")
    val upd = Seq((2L, "B")).toDF("id", "text")
    val got = Items.updateById(base, upd, "id").orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 1.0), (2L, "B", 2.0)))
  }

  test("items: byIds, deleteByIds, extend, bySlice") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    assert(Items.byIds(base, "id", Seq(1L, 3L)).count() == 2)
    assert(Items.deleteByIds(base, "id", Seq(2L)).count() == 2)
    assert(Items.extend(base, base).count() == 6)
    val off = Items.withOffsets(base, $"id")
    assert(Items.bySlice(off, "offset", 1, 3).count() == 2)
  }

  test("byOffsetsOrdered preserves requested order; upsert merges") {
    val base = Items.withOffsets(
      Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("id", "text"), $"id")
    val got = Items.byOffsetsOrdered(base, "offset", Seq(2L, 0L))
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(30L, 10L))
    val up = Items.upsert(base.select("id", "text"),
      Seq((20L, "B"), (40L, "d")).toDF("id", "text"), "id")
    assert(up.count() == 4)
    assert(up.where($"id" === 20L).select("text").as[String].collect()(0) == "B")
  }

  test("bucketed layout write round trips through the table catalog") {
    val df = Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("id", "text", "w")
    Promote.writeLayout(df, "/tmp/graft_bucket_test",
      bucketBy = Some((4, "id")), table = Some("graft_bucket_test"))
    val back = spark.table("graft_bucket_test")
    assert(back.count() == 2)
    spark.sql("DROP TABLE graft_bucket_test")
  }

  test("same-bucketed tables equi-join without a shuffle exchange") {
    val a = spark.range(500).select($"id", ($"id" * 2).as("va"))
    val b = spark.range(500).select($"id", ($"id" * 3).as("vb"))
    Promote.writeLayout(a.toDF(), "/tmp/graft_bjoin_a",
      bucketBy = Some((8, "id")), table = Some("graft_bjoin_a"))
    Promote.writeLayout(b.toDF(), "/tmp/graft_bjoin_b",
      bucketBy = Some((8, "id")), table = Some("graft_bjoin_b"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_bjoin_a").join(spark.table("graft_bjoin_b"), "id")
      assert(j.count() == 500)
      // co-located bucketing: sort-merge join with ZERO Exchange nodes
      val exchanges = j.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty, "bucketed join should not shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE graft_bjoin_a")
      spark.sql("DROP TABLE graft_bjoin_b")
    }
  }

  test("groupOps: splitByTag and batch assignment") {
    val df = Seq((1L, "x"), (2L, "y"), (3L, "x")).toDF("id", "tag")
    val groups = GroupOps.splitByTag(df, $"tag", $"id").orderBy("tag").collect()
    assert(groups.map(_.getString(0)).toSeq == Seq("x", "y"))
    assert(groups(0).getSeq[Long](1) == Seq(1L, 3L))
    val batched = GroupOps.batchIds(df, $"id", 2)
    assert(batched.select(max("batch_id")).as[Long].collect()(0) == 1L)
  }

  test("multimodal pack/attr: modality columns become positioned chunks") {
    val df = Seq((1L, "a caption", Array[Byte](9, 9))).toDF("id", "caption", "image")
    val cols = Seq("caption" -> "text", "image" -> "image")
    val packed = Modalities.pack(df, "id", cols)
    assert(packed.columns.contains("chunks") && !packed.columns.contains("caption"))
    val cap = Modalities.attr(packed, "id", "caption", cols).collect()(0)
    assert(cap.getString(2) == "a caption")
    val img = Modalities.attr(packed, "id", "image", cols).collect()(0)
    assert(img.getAs[Array[Byte]](3).toSeq == Seq[Byte](9, 9))
    assert(img.getString(1) == "image")
    // traversal over packed chunks still works
    assert(Traverse.traverse(packed, "c").count() == 2)
    // attribute steps resolve through the per-row position map
    val viaPath = Traverse.traverse(packed, "r.[caption]").collect()
    assert(viaPath.length == 1)
    assert(viaPath(0).getAs[String]("text") == "a caption")
    assert(viaPath(0).getAs[String]("modality") == "text")
    val both = Traverse.traverse(packed, "r.[image,caption]")
    assert(both.count() == 2)
    assert(Traverse.traverse(packed, "r.[image,caption][0:1]").collect()
      .map(_.getAs[String]("modality")).toSeq == Seq("image"))
    // unknown attribute → empty, not an error
    assert(Traverse.traverse(packed, "r.[nope]").count() == 0)
  }

  test("asof join picks latest right row at-or-before, null when none") {
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (2L, 5L, "t3"))
      .toDF("key", "ts", "tag")
    val quotes = Seq((1L, 8L, 100.0), (1L, 15L, 110.0), (1L, 20L, 120.0))
      .toDF("key", "qts", "price")
    val got = AsOf.join(trades, quotes, Seq("key"), "ts", "qts", Seq("price"))
      .orderBy("ts").collect()
      .map(r => (r.getString(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
    // t1@10 → quote@8; t2@20 → quote@20 (tie = at-or-before); t3 key 2 → null
    assert(got.toSeq == Seq(("t3", -1.0), ("t1", 100.0), ("t2", 120.0)))
  }

  test("asof forward picks earliest right row at-or-after; tolerance nulls") {
    val trades = Seq((1L, 10L, "t1"), (1L, 16L, "t2"), (1L, 30L, "t3"),
      (2L, 5L, "t4")).toDF("key", "ts", "tag")
    val quotes = Seq((1L, 8L, 100.0), (1L, 15L, 110.0), (1L, 16L, 115.0),
      (1L, 20L, 120.0)).toDF("key", "qts", "price")
    def run(tol: Option[Long]) =
      AsOf.join(trades, quotes, Seq("key"), "ts", "qts", Seq("price"),
        direction = "forward", tolerance = tol)
        .orderBy("ts").collect()
        .map(r => (r.getString(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
        .toSeq
    // t4@5 key2 → null; t1@10 → quote@15; t2@16 → quote@16 (tie =
    // at-or-after); t3@30 → nothing follows
    assert(run(None) ==
      Seq(("t4", -1.0), ("t1", 110.0), ("t2", 115.0), ("t3", -1.0)))
    // tolerance 4: t1's match at distance 5 nulls out, t2's tie (0) stays
    assert(run(Some(4L)) ==
      Seq(("t4", -1.0), ("t1", -1.0), ("t2", 115.0), ("t3", -1.0)))
  }

  test("asof backward tolerance nulls far matches, keeps ties") {
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2")).toDF("key", "ts", "tag")
    val quotes = Seq((1L, 2L, 100.0), (1L, 20L, 120.0)).toDF("key", "qts", "price")
    val got = AsOf.join(trades, quotes, Seq("key"), "ts", "qts",
      Seq("price"), tolerance = Some(3L))
      .orderBy("ts").collect()
      .map(r => (r.getString(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
    assert(got.toSeq == Seq(("t1", -1.0), ("t2", 120.0)))
  }

  test("unionLength: overlap merges, nesting free, gaps split, dups once") {
    // key a: [0,10) ∪ [5,15) ∪ [12,13) (nested) ∪ [20,25) → 15 + 5 = 20
    // key b: duplicate [3,7) twice → 4
    val iv = Seq(("a", 0L, 10L), ("a", 5L, 15L), ("a", 12L, 13L),
      ("a", 20L, 25L), ("b", 3L, 7L), ("b", 3L, 7L),
      ("b", 9L, 9L) /* empty: dropped */).toDF("k", "s", "e")
    val got = IntervalJoin.unionLength(iv, Seq("k"), col("s"), col("e"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map("a" -> (4L, 0L, 25L, 20L), "b" -> (2L, 3L, 7L, 4L)))
    // layout invariance
    val again = IntervalJoin.unionLength(iv.repartition(5), Seq("k"),
      col("s"), col("e")).collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(again == got)
  }

  test("modularity: separated cliques score high, scrambled labels low") {
    // two triangles bridged by one edge; m=7
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("a", "b")
    val good = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1), (5L, 1), (6L, 1))
      .toDF("id", "c")
    val r = Graph.modularity(tri, good, "id", "c").head
    assert(r.getAs[Long]("m") === 7L)
    assert(r.getAs[Long]("within") === 6L)
    // degrees: 2,2,3,3,2,2 → d_0 = d_1 = 7 → Σd_c² = 98
    assert(r.getAs[java.math.BigDecimal]("sum_dc2").longValue === 98L)
    val q = r.getAs[Double]("q")
    assert(math.abs(q - (4.0 * 7 * 6 - 98) / (4.0 * 7 * 7)) < 1e-12)
    // the all-in-one partition scores 0 exactly: within=m, Σd² = (2m)²
    val one = Seq(1L, 2L, 3L, 4L, 5L, 6L).map((_, 0)).toDF("id", "c")
    assert(math.abs(Graph.modularity(tri, one, "id", "c")
      .head.getAs[Double]("q")) < 1e-12)
    // alternating labels: worse than the true split
    val bad = Seq((1L, 0), (2L, 1), (3L, 0), (4L, 1), (5L, 0), (6L, 1))
      .toDF("id", "c")
    assert(Graph.modularity(tri, bad, "id", "c").head.getAs[Double]("q") < q)
  }

  test("vocabulary honors minFreq (text.py:8-29)") {
    val df = Seq("a a a b b c").toDF("text")
    val v = GroupOps.vocabulary(df, $"text", minFreq = 2)
      .as[(String, Long)].collect().toMap
    assert(v == Map("a" -> 3L, "b" -> 2L))
  }

  test("sampleExact returns exactly k, deterministic per seed") {
    val df = spark.range(100).toDF("id")
    val s1 = GroupOps.sampleExact(df, 10, 42).as[Long].collect().toSeq
    val s2 = GroupOps.sampleExact(df, 10, 42).as[Long].collect().toSeq
    assert(s1.length == 10 && s1 == s2)
  }

  test("sampleHashed: exact k, layout-invariant, matches reference splitmix64") {
    val df = spark.range(100).toDF("id")
    val pick = GroupOps.sampleHashed(df, 10, 7L, col("id")).as[Long].collect().toSet
    // same draw regardless of partitioning / row order
    val rep = GroupOps.sampleHashed(df.repartition(13), 10, 7L, col("id"))
      .as[Long].collect().toSet
    assert(pick.size == 10 && rep == pick)
    // equals a driver-side replay of splitmix64(id + seed)
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    val expect = (0L until 100L).sortBy(i => mix(i + 7L)).take(10).toSet
    assert(pick == expect)
    // different seed → different draw
    assert(GroupOps.sampleHashed(df, 10, 8L, col("id")).as[Long].collect().toSet != pick)
  }

  test("globalOrderIndex equals a global window row_number, any layout") {
    val df = spark.range(500).select(col("id"),
      pmod(col("id") * 37, lit(11)).as("k"))
    val want = df
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("id")))
        .cast("long") - 1)
      .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 7)) {
      val got = GroupOps.globalOrderIndex(df.repartition(parts), "pos",
        col("k"), col("id"))
        .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("aucExact: hand-checked with ties, extremes, degenerate classes") {
    def auc(rows: Seq[(Double, Boolean)], parts: Int = 3) = {
      val r = Evaluate.aucExact(rows.toDF("s", "p").repartition(parts),
        col("s"), col("p")).head
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }
    // scores: pos {0.8, 0.6}, neg {0.6, 0.2} — the 0.6 tie counts half:
    // pairs: (0.8>0.6)=1, (0.8>0.2)=1, (0.6=0.6)=.5, (0.6>0.2)=1 → 3.5/4
    assert(auc(Seq((0.8, true), (0.6, true), (0.6, false), (0.2, false)))
      == ((2L, 2L, Some(0.875))))
    // perfect separation → 1.0; reversed → 0.0
    assert(auc(Seq((0.9, true), (0.8, true), (0.3, false)))._3.contains(1.0))
    assert(auc(Seq((0.1, true), (0.9, false)))._3.contains(0.0))
    // all scores equal → 0.5 exactly (pure ties)
    assert(auc(Seq((0.5, true), (0.5, false), (0.5, false)))._3.contains(0.5))
    // one class empty → null auc; null scores dropped
    assert(auc(Seq((0.5, true), (0.6, true))) == ((2L, 0L, None)))
    // layout invariance (exact integer rank sums)
    val rnd = new scala.util.Random(17)
    val big = (0 until 500).map(_ =>
      (math.rint(rnd.nextDouble() * 20) / 20.0, rnd.nextBoolean()))
    assert(auc(big, parts = 1) == auc(big, parts = 13))
  }
}
