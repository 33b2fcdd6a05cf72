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
}
