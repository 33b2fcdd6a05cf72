package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Checkpoints.LineageCutOps

/** Density-based clustering over a 2-D projected space — the
  * embedding-space structure-discovery op of corpus curation (cluster
  * the PCA/UMAP-projected corpus, then inspect/keep/drop clusters;
  * noise points are the outlier-removal signal). DBSCAN (Ester et al.
  * 1996) decomposed into the published parallel shape (MR-DBSCAN): a
  * COMPLETE grid-blocked eps-neighbor pair emit
  * ([[Dedup.gridPairs2d]] — cellW >= eps makes blocking lossless), one
  * degree aggregation, and pointer-doubling connected components over
  * the core-core subgraph ([[Dedup.clusters]]) — never an all-pairs
  * scan, never a per-point region query.
  *
  * The classic algorithm's order-dependent border assignment is made
  * deterministic: a border point attaches to the SMALLEST cluster id
  * among its core neighbors, and a cluster's id is the smallest core
  * id in its component — every output is a pure function of the point
  * set, layout-invariant and replayable by an external engine.
  */
object Density {

  /** DBSCAN over points (idCol, xCol, yCol). A point is `core` when its
    * eps-ball holds >= minPts points (itself included); core points
    * within eps are connected; `border` = non-core with a core neighbor
    * (cluster = min over those neighbors' clusters); everything else is
    * `noise` (cluster_id null). Rows with null coordinates are dropped,
    * mirroring [[Dedup.gridPairs2d]].
    *
    * Scale shape: one grid pair emit (9-neighborhood cell join, output
    * linear in the true eps-pair count), one degree agg, CC rounds of
    * two id-keyed joins each (O(log diameter) rounds), one border join.
    * `maxCell` is the degenerate-projection valve inherited from
    * gridPairs2d — points in over-full cells are dropped from pairing
    * (conservative: they become noise).
    *
    * Returns (idCol, kind: core|border|noise, cluster_id). */
  def dbscan2d(df: DataFrame, idCol: String, xCol: String, yCol: String,
      eps: Double, minPts: Int,
      maxCell: Int = Int.MaxValue): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    // lazy localCheckpoint: the pair set materializes once on first
    // use and is reused by the degree/CC/border branches AND by the
    // caller's eventual action (a cache+unpersist here would drop it
    // before the returned lazy plan ever ran)
    val pairs = Dedup.gridPairs2d(df, idCol, xCol, yCol, eps,
        maxCell = maxCell)
      .select(col("a"), col("b")).cutLineage(false)
    val und = pairs.select(col("a").as("_i"), col("b").as("_j"))
      .union(pairs.select(col("b").as("_i"), col("a").as("_j")))
    val deg = und.groupBy("_i").agg(count(lit(1)).as("_deg"))
    val ids = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(idCol).as("_i"))
    val core = ids.join(deg, Seq("_i"), "left")
      .where(coalesce(col("_deg"), lit(0L)) + 1L >= minPts)
      .select(col("_i"))
    val coreSet = core.select(col("_i").as("_c"))
    val coreEdges = pairs
      .join(coreSet.select(col("_c").as("a")), Seq("a"), "left_semi")
      .join(coreSet.select(col("_c").as("b")), Seq("b"), "left_semi")
    val coreLbl = Dedup.clusters(coreEdges, core.select(col("_i")), "_i")
      .select(col("_i"), col("cluster_id"))
    // border: non-core point -> min cluster among its core neighbors
    val borderLbl = und
      .join(core.select(col("_i")), Seq("_i"), "left_anti")
      .join(coreLbl.select(col("_i").as("_j"), col("cluster_id")), Seq("_j"))
      .groupBy("_i").agg(min("cluster_id").as("cluster_id"))
    val out = ids
      .join(coreLbl.withColumn("_kind", lit("core")),
        Seq("_i"), "left")
      .join(borderLbl.select(col("_i"),
          col("cluster_id").as("_bcl")), Seq("_i"), "left")
      .select(col("_i").as(idCol),
        when(col("_kind").isNotNull, lit("core"))
          .when(col("_bcl").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("kind"),
        coalesce(col("cluster_id"), col("_bcl")).as("cluster_id"))
    out
  }
}
