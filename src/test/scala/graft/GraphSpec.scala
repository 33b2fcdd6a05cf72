package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Fixed-point PageRank: hand-derived cycles, dangling leak, duplicate
  * edge collapse, layout invariance. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], iters: Int) = {
    val e = edges.toDF("src", "dst")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
    Graph.pageRankPpb(e, nodes, "node", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("2-cycle conserves mass exactly: ranks stay at r0") {
    // N=2, r0=5e8, deg 1: r' = (5e8*15)//100 + (85*5e8)//100 = 5e8
    val out = run(Seq(("a", "b"), ("b", "a")), iters = 3)
    assert(out === Map("a" -> 500000000L, "b" -> 500000000L))
  }

  test("dangling node keeps receiving, source decays to base") {
    // a -> b, b dangling. N=2: r0=5e8, base=75e6
    val out1 = run(Seq(("a", "b")), iters = 1)
    assert(out1("a") === 75000000L)
    assert(out1("b") === 75000000L + 85L * 500000000L / 100L)
    // iter 2: b's inflow is now a's decayed rank
    val out2 = run(Seq(("a", "b")), iters = 2)
    assert(out2("a") === 75000000L)
    assert(out2("b") === 75000000L + 85L * 75000000L / 100L)
  }

  test("duplicate edges collapse before degrees") {
    val dup = run(Seq(("a", "b"), ("a", "b"), ("b", "a")), iters = 2)
    val once = run(Seq(("a", "b"), ("b", "a")), iters = 2)
    assert(dup === once)
  }

  test("out-degree splits contributions with floor division") {
    // a -> b and a -> c: each gets r0 div 2 damped; N=3, r0=333333333
    val out = run(Seq(("a", "b"), ("a", "c")), iters = 1)
    val r0 = 1000000000L / 3
    val base = (r0 * 15) / 100
    val want = base + 85L * (r0 / 2) / 100L
    assert(out("b") === want && out("c") === want)
    assert(out("a") === base)
  }

  test("layout invariance: repartitioned edges give identical ranks") {
    val edges = (0 until 200).map(i => (s"n${i % 37}", s"n${(i * 7) % 37}"))
    val e = edges.toDF("src", "dst")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
    val a = Graph.pageRankPpb(e, nodes, "node", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Graph.pageRankPpb(e.repartition(7), nodes.repartition(3),
        "node", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("personalizedPageRankPpb: all-seeds equals global; non-seeds get no teleport mass") {
    val e = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("src", "dst")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
    // seeds = all nodes -> identical to the global variant
    val glob = Graph.pageRankPpb(e, nodes, "node", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val allSeeds = Graph.personalizedPageRankPpb(e, nodes, nodes, "node",
      iters = 3).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(allSeeds === glob)
    // seed {a} only — hand-replay of both iterations:
    // r0: a=1e9, b=c=0; base(a)=15e7, others 0
    // i1: b <- a's 1e9 div 1 -> r1 = (15e7, 85e7, 0)
    // i2: a,c <- b's 85e7 div 2 = 425e6; b <- a's 15e7
    //     r2 = (15e7 + 85*425e6//100, 85*15e7//100, 85*425e6//100)
    val ppr = Graph.personalizedPageRankPpb(e, nodes,
        Seq("a").toDF("node"), "node", iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = (1000000000L * 15) / 100
    assert(ppr("a") === base + (85L * (850000000L / 2)) / 100)
    assert(ppr("b") === (85L * base) / 100)
    assert(ppr("c") === (85L * (850000000L / 2)) / 100)
    assert(ppr("a") > ppr("c") && ppr("c") > ppr("b")) // c: flow only, no base
  }

  test("hitsPpm: hand bipartite case, normalization scale, layout invariance") {
    // hubs u1 (points at v1, v2), u2 (points at v2 only)
    val e = Seq(("u1", "v1"), ("u1", "v2"), ("u2", "v2")).toDF("src", "dst")
    val out = Graph.hitsPpm(e, iters = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // iter1: ar(v1)=1e6, ar(v2)=2e6; m = 2 -> a = (500000, 1000000)
    //        hr(u1)=1.5e6, hr(u2)=1e6; m = 1 -> h as-is
    // iter2: ar(v1)=1.5e6, ar(v2)=2.5e6; m = 2 -> a=(750000, 1250000)
    //        hr(u1)=2e6, hr(u2)=1.25e6; m = 2 -> h=(1e6, 625000)
    assert(out("u1") == ((1000000L, 0L)) && out("u2") == ((625000L, 0L)))
    assert(out("v1") == ((0L, 750000L)) && out("v2") == ((0L, 1250000L)))
    // layout invariance
    val rep = Graph.hitsPpm(e.repartition(4), iters = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep === out)
    // the better-connected hub and authority dominate
    assert(out("u1")._1 > out("u2")._1 && out("v2")._2 > out("v1")._2)
  }

  private def triRef(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = pairs.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
    val adj = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      a <- nodes; b <- adj(a).filter(_ > a)
      c <- (adj(a) intersect adj(b)).filter(_ > b)
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  test("triangleCounts: K4, chain, and random-graph parity with brute force") {
    // K4: every node in C(3,2)=3 triangles
    val k4 = (for { a <- 0L to 3L; b <- (a + 1) to 3L } yield (a, b)).toSeq
    val gotK4 = Graph.triangleCounts(k4.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotK4 == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))

    // a chain has no triangles -> empty result
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(Graph.triangleCounts(chain).count() === 0)

    // random graph: parity with the reference counter; duplicate and
    // reversed pairs and self-loops must not change the answer
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val noisy = pairs ++ pairs.take(50).map(_.swap) ++
      Seq((7L, 7L), (3L, 3L))
    val got = Graph.triangleCounts(noisy.toDF("a", "b").repartition(5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == triRef(pairs))
  }

  private def w(deg: Int): Long = math.round(1e9 / math.log(deg.toDouble))

  test("adamicAdar: hand case — centers weight 1/ln(deg), ppb-exact sums") {
    // w: {a,b,c}, z: {a,b}; a,b: {w,z}; c: {w}
    val edges = Seq(("a", "w"), ("b", "w"), ("c", "w"), ("a", "z"), ("b", "z"))
      .toDF("a", "b")
    val got = Graph.adamicAdar(edges)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      ("a", "b") -> (2L, w(3) + w(2)), // shared w (deg3) and z (deg2)
      ("a", "c") -> (1L, w(3)),
      ("b", "c") -> (1L, w(3)),
      ("w", "z") -> (2L, 2 * w(2)))) // centers a and b, deg 2 each
  }

  test("adamicAdar: brute-force parity on a noisy random graph") {
    val rnd = new scala.util.Random(23)
    val pairs = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2)
    val noisy = pairs ++ pairs.take(40).map(_.swap) ++ Seq((5L, 5L))
    // reference: adjacency sets, every pair's common neighbors
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    pairs.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a }
    val nodes = adj.keys.toSeq.sorted
    val ref = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      common = adj(nodes(i)) & adj(nodes(j)) if common.nonEmpty
    } yield (nodes(i), nodes(j)) ->
        (common.size.toLong, common.toSeq.map(c => w(adj(c).size)).sum)
      ).toMap
    val got = Graph.adamicAdar(noisy.toDF("a", "b").repartition(5))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == ref)
  }

  test("adamicAdar: maxDegree valve drops hub centers only") {
    val edges = Seq(("a", "w"), ("b", "w"), ("c", "w"), ("a", "z"), ("b", "z"))
      .toDF("a", "b")
    val got = Graph.adamicAdar(edges, maxDegree = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // w (deg 3) no longer mediates: (a,c)/(b,c) vanish, (a,b) keeps z only
    assert(got == Map(
      ("a", "b") -> (1L, w(2)),
      ("w", "z") -> (2L, 2 * w(2))))
  }

  test("kCore: chain peels round by round, K4 survives; fixpoint") {
    // K4 on 1..4 plus a tail 4-5, 5-6
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val g = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("a", "b")
    def run(k: Int, rounds: Int): Map[Long, Long] =
      Graph.kCore(g, k, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // k=2, one round: only 6 (deg 1) peels; 5 keeps edge to 4
    assert(run(2, 1) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 1L))
    // k=2, two rounds: 5 (now deg 1) peels too -> the 2-core is K4
    val core2 = Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
    assert(run(2, 2) == core2)
    assert(run(2, 5) == core2) // fixpoint: extra rounds change nothing
    // k=3: K4 survives immediately (tail gone in round 1), degrees 3
    assert(run(3, 2) == core2)
    // k=5: nothing survives
    assert(run(5, 2) == Map.empty)
  }

  test("pageRankWeightedPpb: uniform weights equal the unweighted ranks") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.map(Tuple1(_))
      .toDF("node")
    val unw = Graph.pageRankPpb(e.toDF("src", "dst"), nodes, "node", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = Graph.pageRankWeightedPpb(
      e.map { case (s, d) => (s, d, 5L) }.toDF("src", "dst", "w"),
      nodes, "node", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w == unw) // (r·w) div (deg·w) == r div deg for uniform w
  }

  test("pageRankWeightedPpb: weights steer mass; bad weights refuse") {
    // a splits 3:1 between b and c
    val e = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L),
      ("c", "a", 1L)).toDF("src", "dst", "w")
    val nodes = Seq("a", "b", "c").map(Tuple1(_)).toDF("node")
    val got = Graph.pageRankWeightedPpb(e, nodes, "node", 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // r0 = 333333333, base = 49999999 (ppb, damp 85/100)
    val r0 = 333333333L; val base = (r0 * 15) / 100
    assert(got("b") === base + 85L * ((r0 * 3) / 4) / 100)
    assert(got("c") === base + 85L * ((r0 * 1) / 4) / 100)
    val bad = Seq(("a", "b", 0L)).toDF("src", "dst", "w")
    val ex = intercept[Exception] {
      Graph.pageRankWeightedPpb(bad, nodes, "node", 1).collect()
    }
    assert(ex.getMessage.contains("edge weight out of"))
  }

  test("bfsDistances: hop distances, truncation, off-graph seeds") {
    // path a-b-c-d-e plus isolated seed z
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("a", "b")
    val seeds = Seq("a", "z").map(Tuple1(_)).toDF("node")
    val got = Graph.bfsDistances(g, seeds, "node", maxHops = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // e is 4 hops out -> absent at maxHops=3; z sits at 0 despite no edges
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L,
      "z" -> 0L))
    // two seeds: min distance wins
    val got2 = Graph.bfsDistances(g,
      Seq("a", "e").map(Tuple1(_)).toDF("node"), "node", maxHops = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2 == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 1L,
      "e" -> 0L))
  }

  test("labelPropagation: bridged triangles split into two communities, isolated keeps own") {
    // one connected component, two dense communities over a thin bridge
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("a", "b")
    val nodes = (1L to 7L).map(Tuple1(_)).toDF("id") // 7 isolated
    val got = Graph.labelPropagation(g, nodes, "id", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-traced fixed point: triangle {1,2,3} -> 1, {4,5,6} -> 3
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L,
      5L -> 3L, 6L -> 3L, 7L -> 7L))
    // contrast: connectivity clusters put 1..6 in ONE component
    val cc = graft.operators.Dedup.clusters(g,
        (1L to 6L).map(Tuple1(_)).toDF("id"), "id")
      .select("cluster_id").distinct().count()
    assert(cc == 1L)
    // layout invariance
    val got7 = Graph.labelPropagation(g.repartition(7), nodes, "id",
      rounds = 4).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got7 == got)
  }

  test("louvainRounds: modularity local move merges triangles, phases stop swaps") {
    // the labelPropagation graph: two triangles over a thin bridge + an
    // isolated node; explicit id-parity phases for the hand trace
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("a", "b")
    val nodes = (1L to 7L).map(Tuple1(_)).toDF("id")
    val got = Graph.louvainRounds(g, nodes, "id", rounds = 3,
        phaseCol = pmod(col("_id"), lit(2)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-traced: round 0 (even ids move): 2→c1 (score 14−2·2=10 beats
    // c3's 8), 4→c5 (ties c5/c6 at 8, smaller label), 6→c5; round 1
    // (odd): 3 joins c1 (2·14−3·4=16 > stay 0), 1 and 5 stay; round 2:
    // fixed point — each triangle is one community, isolated 7 keeps 7
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 5L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
    // the achieved partition is modularity-positive and layout-stable
    val q = Graph.modularity(g, Graph.louvainRounds(g.repartition(5),
        nodes, "id", rounds = 3, phaseCol = pmod(col("_id"), lit(2))),
      "id", "label").select("q").as[Double].head()
    assert(q > 0.3, s"expected dense two-community Q, got $q")
    // default hash-parity phases: deterministic across runs and layouts
    val d1 = Graph.louvainRounds(g, nodes, "id", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d2 = Graph.louvainRounds(g.repartition(7), nodes, "id", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d1 == d2)
  }

  test("louvainCoarsen: weighted supernode edges conserve edge mass") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L), (3L, 4L), (4L, 3L)).toDF("a", "b") // dups collapse
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L),
      (5L, 20L), (6L, 20L), (7L, 7L)).toDF("id", "lab")
    val got = Graph.louvainCoarsen(g, labels, "id", "lab")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // 3 within edges per triangle (self-loops), 1 bridge; total = 7 = m
    assert(got == Map((10L, 10L) -> 3L, (20L, 20L) -> 3L,
      (10L, 20L) -> 1L))
    assert(got.values.sum == 7L)
  }
}
