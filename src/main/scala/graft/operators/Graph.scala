package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph centrality in EXACT fixed-point integer arithmetic —
  * the crawl-graph quality-weighting op of web-corpus curation
  * (CommonCrawl-lineage pipelines weight documents by host-graph
  * centrality). Ranks live in parts-per-billion longs and every step is
  * a floor division, so any iteration count is layout-invariant and
  * bit-replayable by an external SQL engine — no float accumulation
  * anywhere.
  *
  * Scale shape: per iteration ONE edges⋈ranks join (id-keyed shuffle of
  * O(|E|) rows) and one dst-keyed partial-agg sum, exactly the
  * [[Dedup.clusters]] convergence-join shape; `localCheckpoint` cuts
  * the growing lineage each round. Degrees are computed once.
  */
object Graph {

  /** PageRank, damped `dampNum/dampDen`, `iters` fixed iterations:
    *
    *   r₀       = 10⁹ div N                      (every node)
    *   rᵢ₊₁(v)  = base + (dampNum · Σ_{u→v} (rᵢ(u) div deg(u))) div dampDen
    *   base     = ((10⁹ div N) · (dampDen − dampNum)) div dampDen
    *
    * All divisions floor on exact longs. Dangling nodes (no out-edges)
    * leak their mass — the simple deterministic rule; re-inject it
    * upstream by adding self-loops if conservation matters. Duplicate
    * edges are collapsed. Returns (idCol, rank_ppb). */
  def pageRankPpb(edges: DataFrame, nodes: DataFrame, idCol: String,
      iters: Int, dampNum: Int = 85, dampDen: Int = 100): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum > 0 && dampDen > dampNum,
      s"need 0 < dampNum < dampDen, got $dampNum/$dampDen")
    val e = edges.select(col("src"), col("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("_deg"))
    val n = nodes.select(col(idCol)).distinct().count()
    require(n > 0, "empty node set")
    val r0 = 1000000000L / n
    val base = (r0 * (dampDen - dampNum)) / dampDen
    var ranks = nodes.select(col(idCol).as("_id")).distinct()
      .withColumn("_r", lit(r0))
    for (_ <- 0 until iters) {
      val contrib = e.join(ranks, e("src") === ranks("_id"))
        .join(deg, Seq("src"))
        .select(col("dst"), expr("_r div _deg").as("_c"))
        .groupBy("dst").agg(sum("_c").as("_in"))
      ranks = ranks.join(contrib, ranks("_id") === contrib("dst"), "left")
        .select(col("_id"),
          (lit(base) +
            expr(s"($dampNum * coalesce(_in, 0L)) div $dampDen")).as("_r"))
        .localCheckpoint(false)
    }
    ranks.select(col("_id").as(idCol), col("_r").as("rank_ppb"))
  }

  /** Personalized PageRank, same exact fixed-point integer arithmetic
    * as [[pageRankPpb]] but with teleport mass restricted to `seeds` —
    * "importance relative to THIS slice" (which hosts/docs are central
    * to a topic seed set; graph-proximity data valuation):
    *
    *   r₀(v)    = [v∈S] · (10⁹ div |S|)
    *   rᵢ₊₁(v)  = [v∈S] · base + (dampNum · Σ_{u→v} rᵢ(u) div deg(u))
    *              div dampDen
    *
    * Seeds not present in `nodes` contribute nothing (their share of
    * the 10⁹ is simply never injected — document, don't guess). Same
    * per-iteration shape and determinism guarantees as the global
    * variant. */
  def personalizedPageRankPpb(edges: DataFrame, nodes: DataFrame,
      seeds: DataFrame, idCol: String, iters: Int,
      dampNum: Int = 85, dampDen: Int = 100): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum > 0 && dampDen > dampNum,
      s"need 0 < dampNum < dampDen, got $dampNum/$dampDen")
    val e = edges.select(col("src"), col("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("_deg"))
    val sd = seeds.select(col(idCol).as("_id")).distinct()
    val m = sd.count()
    require(m > 0, "empty seed set")
    val r0 = 1000000000L / m
    val base = (r0 * (dampDen - dampNum)) / dampDen
    var ranks = nodes.select(col(idCol).as("_id")).distinct()
      .join(sd.withColumn("_s", lit(1)), Seq("_id"), "left")
      .select(col("_id"),
        when(col("_s").isNotNull, lit(r0)).otherwise(lit(0L)).as("_r"),
        when(col("_s").isNotNull, lit(base)).otherwise(lit(0L)).as("_b"))
    for (_ <- 0 until iters) {
      val contrib = e.join(ranks, e("src") === ranks("_id"))
        .join(deg, Seq("src"))
        .select(col("dst"), expr("_r div _deg").as("_c"))
        .groupBy("dst").agg(sum("_c").as("_in"))
      ranks = ranks.join(contrib, ranks("_id") === contrib("dst"), "left")
        .select(col("_id"), col("_b"),
          (col("_b") +
            expr(s"($dampNum * coalesce(_in, 0L)) div $dampDen")).as("_r"))
        .localCheckpoint(false)
    }
    ranks.select(col("_id").as(idCol), col("_r").as("rank_ppb"))
  }

  /** HITS hubs-and-authorities (Kleinberg) in exact integer
    * arithmetic — the bipartite-centrality complement of
    * [[pageRankPpb]] (who aggregates from good sources / who is cited
    * by good aggregators; the crawl seed-list quality signal). Per
    * iteration:
    *
    *   a_raw(v) = Σ_{u→v} h(u);   a(v) = a_raw div max(1, max(a_raw) div 10⁶)
    *   h_raw(u) = Σ_{u→v} a(v);   h(u) = h_raw div max(1, max(h_raw) div 10⁶)
    *
    * The floor-div max normalization keeps every value ≈ 10⁶ WITHOUT a
    * big multiply — overflow-free for any realistic node count (sums
    * stay under n·10⁶ < 2⁶³ for n < 9·10¹²) and exactly replayable by
    * integer `//`. Two 1-row max aggregates (driver hops) + two
    * id-keyed join/agg shuffles per iteration. Returns (node, hub_ppm,
    * auth_ppm) over all nodes (0 where the node has no out-/in-edges). */
  def hitsPpm(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    var hubs = e.select(col("src").as("_id")).distinct()
      .withColumn("_h", lit(1000000L))
    var auths = e.select(col("dst").as("_id")).distinct()
      .withColumn("_a", lit(0L))
    for (_ <- 0 until iters) {
      def maxDiv(df: DataFrame, c: String): Long = {
        val m = df.agg(max(col(c))).head
        if (m.isNullAt(0)) 1L else math.max(1L, m.getLong(0) / 1000000L)
      }
      val aRaw = e.join(hubs, e("src") === hubs("_id"))
        .groupBy(col("dst")).agg(sum("_h").as("_ar"))
      val amax = maxDiv(aRaw, "_ar")
      auths = aRaw.select(col("dst").as("_id"),
        expr(s"_ar div ${amax}L").as("_a")).localCheckpoint(false)
      val hRaw = e.join(auths, e("dst") === auths("_id"))
        .groupBy(col("src")).agg(sum("_a").as("_hr"))
      val hmax = maxDiv(hRaw, "_hr")
      hubs = hRaw.select(col("src").as("_id"),
        expr(s"_hr div ${hmax}L").as("_h")).localCheckpoint(false)
    }
    val out = hubs.join(auths, Seq("_id"), "full_outer")
      .select(col("_id").as("node"),
        coalesce(col("_h"), lit(0L)).as("hub_ppm"),
        coalesce(col("_a"), lit(0L)).as("auth_ppm"))
    e.unpersist()
    out
  }

  /** Exact per-node triangle counts over an undirected pair set — the
    * cohesion probe of near-dup cluster QA (a dup "cluster" that is a
    * chain of borderline pairs has few triangles; a true clique is
    * dense with them) and of any similarity graph.
    *
    * The classic distributed shape (Suri & Vassilvitskii 2011): orient
    * every edge from its lower endpoint in the total order (degree,
    * id) — each triangle then has exactly ONE node with two outgoing
    * edges, so wedges built from the oriented adjacency self-join are
    * counted once when the closing edge exists. Orientation caps
    * out-degrees at O(√|E|), which bounds the wedge explosion — the
    * property that makes this the 100 TB triangle algorithm. Self
    * loops dropped, duplicate pairs collapsed.
    *
    * Returns (node, triangles) for nodes in >= 1 triangle. */
  def triangleCounts(pairs: DataFrame, aCol: String = "a",
      bCol: String = "b"): DataFrame = {
    val e0 = pairs.select(col(aCol).as("x"), col(bCol).as("y"))
      .where(col("x") =!= col("y"))
    val und = e0.union(e0.select(col("y").as("x"), col("x").as("y")))
      .distinct()
    val deg = und.groupBy("x").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("x"), col("d").as("_du")), Seq("x"))
      .join(deg.select(col("x").as("y"), col("d").as("_dv")), Seq("y"))
    val dir = withDeg.where(col("_du") < col("_dv") ||
        (col("_du") === col("_dv") && col("x") < col("y")))
      .select(col("x").as("u"), col("y").as("v"))
    val wedges = dir.join(dir.select(col("u"), col("v").as("w")), Seq("u"))
      .where(col("v") < col("w"))
    val tri = wedges.join(und.select(col("x").as("v"), col("y").as("w")),
      Seq("v", "w"), "left_semi")
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }
}
