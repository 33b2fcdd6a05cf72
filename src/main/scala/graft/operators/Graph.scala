package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Checkpoints.LineageCutOps

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
  * [[Dedup.clusters]] convergence-join shape; [[Checkpoints.LineageCutOps
  * cutLineage]] cuts the growing lineage each round (reliable
  * `checkpoint` under `spark.graft.checkpoint.reliable=true`). Degrees are computed once.
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
        .cutLineage(false)
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
        .cutLineage(false)
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
        expr(s"_ar div ${amax}L").as("_a")).cutLineage(false)
      val hRaw = e.join(auths, e("dst") === auths("_id"))
        .groupBy(col("src")).agg(sum("_a").as("_hr"))
      val hmax = maxDiv(hRaw, "_hr")
      hubs = hRaw.select(col("src").as("_id"),
        expr(s"_hr div ${hmax}L").as("_h")).cutLineage(false)
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

  /** Common-neighbor link prediction: for every node pair at distance
    * 2, the shared-neighbor count and the Adamic–Adar score
    * Σ_{w ∈ N(a)∩N(b)} 1/ln(deg(w)) — rare shared neighbors vote
    * loudly, hub neighbors barely count. The "which docs/hosts/items
    * WILL be related" signal: candidate generation for recommenders,
    * entity-graph completion, crawl frontier ranking.
    *
    * Exactness: each center's weight is quantized ONCE to ppb
    * (`round(10⁹/ln(deg))` — the q172 single-quantize ln rule), then
    * summed as exact integers — order-free, layout-invariant, and
    * replayable by any SQL engine.
    *
    * Scale shape: wedges explode from the center-keyed adjacency
    * self-join — Σ_w deg(w)² rows. `maxDegree` is the hub valve
    * (centers above it are dropped — documented recall loss on
    * hub-mediated pairs, the [[Dedup]] `maxDocFreq` rule); in a
    * bipartite graph it also selects WHICH side mediates (e.g. keep
    * user-centers to score item pairs). Pairs that are already edges
    * are still scored — anti-join the edge list for strict link
    * prediction. Returns (a, b, cn, aa_ppb), a < b. */
  def adamicAdar(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
      maxDegree: Long = Long.MaxValue): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2, got $maxDegree")
    val e0 = pairs.select(col(aCol).as("x"), col(bCol).as("y"))
      .where(col("x") =!= col("y"))
    val und = e0.union(e0.select(col("y").as("x"), col("x").as("y")))
      .distinct()
    val deg = und.groupBy("x").agg(count(lit(1)).as("_deg"))
    val adj = und.join(deg, Seq("x"))
      .where(col("_deg") >= 2 && col("_deg") <= maxDegree)
      .withColumn("_w",
        round(lit(1e9) / log(col("_deg").cast("double"))).cast("long"))
    val wedges = adj.select(col("x"), col("y").as("a"), col("_w"))
      .join(adj.select(col("x"), col("y").as("b")), Seq("x"))
      .where(col("a") < col("b"))
    wedges.groupBy("a", "b")
      .agg(count(lit(1)).as("cn"), sum("_w").as("aa_ppb"))
  }

  /** k-core peeling: `rounds` rounds of "drop every node with degree
    * < k" over the undirected graph — the standard dense-substructure
    * extractor (spam-farm / engagement-core detection on interaction
    * graphs; separating genuinely dense near-dup cliques from chains
    * the same way [[triangleCounts]] probes cohesion). With `rounds`
    * large enough to reach the fixpoint this is exactly the k-core;
    * fixed `rounds` keeps any prefix of the computation deterministic
    * and externally replayable (the [[pageRankPpb]] fixed-iters rule) —
    * converged runs are detectable by every output degree being >= k.
    *
    * Per round: one degree agg + two semi-joins (id-keyed shuffles of
    * O(|E|) rows), `localCheckpoint` cutting the lineage — the
    * convergence-join shape. Returns surviving (node, degree) over the
    * final edge set. */
  def kCore(pairs: DataFrame, k: Int, rounds: Int, aCol: String = "a",
      bCol: String = "b"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e0 = pairs.select(col(aCol).as("x"), col(bCol).as("y"))
      .where(col("x") =!= col("y"))
    var und = e0.union(e0.select(col("y").as("x"), col("x").as("y")))
      .distinct()
    for (_ <- 0 until rounds) {
      val keep = und.groupBy("x").agg(count(lit(1)).as("_d"))
        .where(col("_d") >= k).select("x")
      und = und.join(keep, Seq("x"), "left_semi")
        .join(keep.select(col("x").as("y")), Seq("y"), "left_semi")
        .select(col("x"), col("y"))
        .cutLineage(false)
    }
    und.groupBy("x").agg(count(lit(1)).as("degree"))
      .select(col("x").as("node"), col("degree"))
  }

  /** Weighted PageRank in the same exact fixed-point integer
    * arithmetic as [[pageRankPpb]]: each out-edge carries an integral
    * weight and a node's rank splits proportionally —
    *
    *   rᵢ₊₁(v) = base + (dampNum · Σ_{u→v} (rᵢ(u)·w(u,v)) div W(u))
    *             div dampDen,   W(u) = Σ out-weights of u
    *
    * — link strength (trade volume, click counts, citation counts)
    * weighted into the centrality instead of flattened to 0/1.
    * Duplicate (src, dst) edges sum their weights; non-positive
    * weights are rejected in-plan. r·w needs w ≤ ~9·10⁹ to stay in a
    * long against r ≤ 10⁹ — enforced loudly. Same per-iteration
    * join/agg shape and determinism guarantees as the unweighted
    * variant; floor leakage per edge mirrors its div-by-degree rule. */
  def pageRankWeightedPpb(edges: DataFrame, nodes: DataFrame,
      idCol: String, iters: Int, dampNum: Int = 85,
      dampDen: Int = 100): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum > 0 && dampDen > dampNum,
      s"need 0 < dampNum < dampDen, got $dampNum/$dampDen")
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
      .select(col("src"), col("dst"),
        when(col("w").isNull || col("w") <= 0 || col("w") > 9000000000L,
          raise_error(concat(lit("pageRankWeightedPpb: edge weight out " +
            "of (0, 9e9]: "), col("w").cast("string"))))
          .otherwise(col("w")).as("w"))
    val wsum = e.groupBy("src").agg(sum("w").as("_wsum"))
    val n = nodes.select(col(idCol)).distinct().count()
    require(n > 0, "empty node set")
    val r0 = 1000000000L / n
    val base = (r0 * (dampDen - dampNum)) / dampDen
    var ranks = nodes.select(col(idCol).as("_id")).distinct()
      .withColumn("_r", lit(r0))
    for (_ <- 0 until iters) {
      val contrib = e.join(ranks, e("src") === ranks("_id"))
        .join(wsum, Seq("src"))
        .select(col("dst"), expr("(_r * w) div _wsum").as("_c"))
        .groupBy("dst").agg(sum("_c").as("_in"))
      ranks = ranks.join(contrib, ranks("_id") === contrib("dst"), "left")
        .select(col("_id"),
          (lit(base) +
            expr(s"($dampNum * coalesce(_in, 0L)) div $dampDen")).as("_r"))
        .cutLineage(false)
    }
    ranks.select(col("_id").as(idCol), col("_r").as("rank_ppb"))
  }

  /** Graph feature smoothing — the GNN-precompute / label-spreading
    * primitive: `rounds` rounds of neighborhood mean over the
    * undirected pair graph,
    *
    *   x_{t+1}(v) = (Σ_{u~v} x_t(u)) div deg(v)
    *
    * in exact integer arithmetic (quantize the feature upstream —
    * ppm — so every round replays bit-for-bit; the floor leakage per
    * node mirrors [[pageRankPpb]]'s div rule). Isolated nodes keep
    * their value (no neighborhood, no smoothing). SGC (Wu et al. 2019)
    * shows exactly this precomputation recovers most of a GCN's
    * accuracy — so it's the honest scalable baseline before any
    * parameter server.
    *
    * Scale shape per round: one edges⋈features join + one node-keyed
    * agg + the degree join — O(|E|) shuffled rows, lineage cut per
    * round. Returns (idCol, x_ppm) after the final round. */
  def featureSmoothPpm(pairs: DataFrame, feats: DataFrame, idCol: String,
      valCol: Column, rounds: Int,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e0 = pairs.select(col(aCol).as("x"), col(bCol).as("y"))
      .where(col("x") =!= col("y"))
    val und = e0.union(e0.select(col("y").as("x"), col("x").as("y")))
      .distinct()
    val deg = und.groupBy("x").agg(count(lit(1)).as("_deg"))
    var xs = feats.select(col(idCol).as("_id"),
      valCol.cast("long").as("_x"))
    for (_ <- 0 until rounds) {
      val nbr = und.join(xs, und("y") === xs("_id"))
        .groupBy("x").agg(sum("_x").as("_s"))
        .join(deg, "x")
        .select(col("x").as("_nid"), expr("_s div _deg").as("_xn"))
      xs = xs.join(nbr, xs("_id") === nbr("_nid"), "left")
        .select(col("_id"), coalesce(col("_xn"), col("_x")).as("_x"))
        .cutLineage(false)
    }
    xs.select(col("_id").as(idCol), col("_x").as("x_ppm"))
  }

  /** Multi-source BFS distances: min hop count from any seed within
    * `maxHops`, over the undirected pair graph — "how far is this
    * node from the trusted/flagged set", the graph-proximity data-
    * valuation and contamination-spread readout. Fixed `maxHops`
    * keeps the computation deterministic and replayable round by
    * round (the [[pageRankPpb]] fixed-iters rule); unreached nodes are
    * absent from the output.
    *
    * Per hop: one edges⋈dist join + one min agg + lineage cut — the
    * convergence-join shape, O(|E|) shuffled rows per hop. Seeds not
    * present in the graph still appear at distance 0. */
  def bfsDistances(pairs: DataFrame, seeds: DataFrame, idCol: String,
      maxHops: Int, aCol: String = "a", bCol: String = "b"): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e0 = pairs.select(col(aCol).as("x"), col(bCol).as("y"))
      .where(col("x") =!= col("y"))
    val und = e0.union(e0.select(col("y").as("x"), col("x").as("y")))
      .distinct()
    var dist = seeds.select(col(idCol).as("_id")).distinct()
      .withColumn("_d", lit(0L))
    for (_ <- 0 until maxHops) {
      val nd = und.join(dist, und("x") === dist("_id"))
        .select(col("y").as("_id"), (col("_d") + 1L).as("_d"))
      dist = dist.union(nd).groupBy("_id").agg(min("_d").as("_d"))
        .cutLineage(false)
    }
    dist.select(col("_id").as(idCol), col("_d").as("dist"))
  }

  /** Exact Newman modularity of a node partition over an undirected
    * pair graph — "is this clustering denser than chance?", the
    * quality readout for any community/cluster assignment (near-dup
    * components, k-means domains, k-cores):
    *
    *   Q = within/m − Σ_c d_c² / (4m²)
    *     = (4·m·within − Σ_c d_c²) / (4m²)
    *
    * m = edge count, within = edges with both endpoints in the same
    * community, d_c = total degree of community c. All three inputs
    * are exact integers (d_c² summed in Decimal(38,0) — overflow-free
    * at any scale); q is the ONE float chain. Edges with an unlabeled
    * endpoint are dropped (document-don't-guess rule); duplicate /
    * reversed / self-loop pairs are collapsed first. `labels` must
    * carry ONE row per node — duplicate label rows would multiply the
    * joined edges and inflate every count.
    *
    * Scale shape: two id-keyed label joins + three aggregations —
    * no iteration, no windows. Returns one row
    * (m, within, sum_dc2, q). */
  def modularity(pairs: DataFrame, labels: DataFrame,
      idCol: String, labelCol: String,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    val e = pairs
      .select(least(col(aCol), col(bCol)).as("x"),
        greatest(col(aCol), col(bCol)).as("y"))
      .where(col("x") =!= col("y")).distinct()
    val la = labels.select(col(idCol).as("x"), col(labelCol).as("_lx"))
    val lb = labels.select(col(idCol).as("y"), col(labelCol).as("_ly"))
    val el = e.join(la, "x").join(lb, "y")
    val mw = el.agg(count(lit(1)).as("m"),
      sum(when(col("_lx") === col("_ly"), 1L).otherwise(0L)).as("within"))
    val dc2 = el
      .select(explode(array(
        struct(col("x").as("v"), col("_lx").as("l")),
        struct(col("y").as("v"), col("_ly").as("l")))).as("s"))
      .select(col("s.v"), col("s.l"))
      .groupBy("l").agg(count(lit(1)).as("_dc")) // Σ incident edge ends
      .agg(sum(col("_dc").cast("decimal(38,0)") * col("_dc"))
        .as("sum_dc2"))
    mw.crossJoin(dc2)
      .select(col("m"), col("within"), col("sum_dc2"),
        ((lit(4.0) * col("m") * col("within") -
          col("sum_dc2").cast("double")) /
          (lit(4.0) * col("m") * col("m"))).as("q"))
  }

  /** Synchronous label-propagation communities (Raghavan et al. 2007),
    * made DETERMINISTIC: every node starts as its own label; each
    * round every node simultaneously adopts the most frequent label
    * among its neighbors, ties broken by the SMALLEST label (the
    * random-order/random-tie choices of the paper are replaced by a
    * fixed total order so the result is layout- and engine-stable).
    * Fixed `rounds` (synchronous LPA can 2-cycle on bipartite
    * structures — a fixed round count is the documented determinism
    * contract, not a convergence promise); isolated nodes keep their
    * own label. Where [[Dedup.clusters]] answers "what is CONNECTED",
    * LPA answers "what is DENSELY connected" — components that share
    * only thin bridges split into separate communities.
    *
    * Scale shape: per round ONE edges⋈labels join (O(|E|) rows), a
    * (node, label) partial-agg count, and an argmax window partitioned
    * per node over its ≤degree distinct neighbor labels — never
    * global; `localCheckpoint` cuts the lineage each round (the
    * [[pageRankPpb]] pattern). Returns (idCol, label). */
  def labelPropagation(pairs: DataFrame, nodes: DataFrame, idCol: String,
      rounds: Int, aCol: String = "a", bCol: String = "b"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    import org.apache.spark.sql.expressions.Window
    val e0 = pairs.select(col(aCol).as("x"), col(bCol).as("y"))
      .where(col("x") =!= col("y"))
    val und = e0.union(e0.select(col("y").as("x"), col("x").as("y")))
      .distinct()
    var lab = nodes.select(col(idCol).as("_id")).distinct()
      .withColumn("_l", col("_id"))
    for (_ <- 0 until rounds) {
      val nbr = und.join(lab, und("y") === lab("_id"))
        .select(col("x"), col("_l"))
        .groupBy("x", "_l").agg(count(lit(1)).as("_c"))
      val w = Window.partitionBy(col("x"))
        .orderBy(col("_c").desc, col("_l").asc)
      val best = nbr.withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1).select(col("x").as("_id"),
          col("_l").as("_nl"))
      lab = lab.join(best, Seq("_id"), "left")
        .select(col("_id"), coalesce(col("_nl"), col("_l")).as("_l"))
        .cutLineage(false)
    }
    lab.select(col("_id").as(idCol), col("_l").as("label"))
  }

  /** Synchronous Louvain-style modularity local move (Blondel et al.
    * 2008, phase 1), made DETERMINISTIC and EXACT-INTEGER: every node
    * starts as its own community; each round every node simultaneously
    * evaluates moving to each neighboring community and takes the one
    * with the best modularity gain. The Louvain gain comparison
    *
    *   ΔQ(i→c) ∝ k_i→c / m  −  k_i · Σtot'(c) / (2m²)
    *
    * is decided by the cross-multiplied integer score
    *
    *   score(c) = 2m · k_i→c − k_i · Σtot'(c)
    *
    * where k_i→c = edges from i into c, Σtot'(c) = total degree of c
    * MINUS k_i when c is i's current community (the self-exclusion of
    * the published formula), and m = edge count — all exact integers
    * (Decimal(38,0) products, overflow-free at any graph size), so the
    * argmax is engine- and layout-stable with no float anywhere. A node
    * moves only when the best score STRICTLY beats its current
    * community's score (ties keep the node put; among equal best
    * targets the smallest community label wins) — the determinism
    * contract that replaces the paper's sequential random node order,
    * at the price of possible 2-cycles on symmetric structures, so
    * `rounds` is fixed, not a convergence promise (the
    * [[labelPropagation]] contract).
    *
    * Where [[labelPropagation]] moves to the most COMMON neighbor
    * label, this op weighs each candidate against the degree mass it
    * would join — hubs stop absorbing everything once Σtot grows, the
    * modularity null model at work. Chain [[modularity]] on the result
    * to read the achieved Q off its exact sufficient statistics.
    *
    * Simultaneous moves of ALL nodes would let symmetric pairs swap
    * communities forever (i adopts j's community while j adopts i's —
    * the 2-cycle above, every round). The standard distributed-Louvain
    * mitigation applies: rounds alternate between two node phases
    * (`phaseCol` parity — default a hash parity of the id; pass an
    * explicit parity column over the internal `_id` node column, e.g.
    * `pmod(col("_id"), lit(2))`, for engine-replicable runs), so a node
    * and its neighbor never move in the same round and singleton
    * attractors drain instead of ping-ponging.
    *
    * Scale shape, per round: ONE edges⋈labels join (O(|E|) rows) into
    * a (node, community) partial-agg count, a degree-mass groupBy of
    * O(|V|) rows, and an argmax window per node over its ≤degree
    * candidate communities — never global; lineage cut each round.
    * Returns (idCol, label). */
  def louvainRounds(pairs: DataFrame, nodes: DataFrame, idCol: String,
      rounds: Int, aCol: String = "a", bCol: String = "b",
      phaseCol: Column = null): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    import org.apache.spark.sql.expressions.Window
    val e0 = pairs
      .select(least(col(aCol), col(bCol)).as("x"),
        greatest(col(aCol), col(bCol)).as("y"))
      .where(col("x") =!= col("y")).distinct()
    val und = e0.union(e0.select(col("y").as("x"), col("x").as("y")))
      .cache()
    val deg = und.groupBy("x").agg(count(lit(1)).as("_k")).cache()
    val m2 = lit(und.count()) // = 2m (each edge counted both ways)
    val phase = Option(phaseCol).getOrElse(pmod(xxhash64(col("_id")), lit(2)))
    var lab = nodes.select(col(idCol).as("_id")).distinct()
      .withColumn("_l", col("_id"))
      .withColumn("_ph", phase)
    for (round <- 0 until rounds) {
      // k_i→c over current labels (candidate = every neighboring community)
      val kin = und.join(lab.select(col("_id").as("y"), col("_l")), "y")
        .groupBy(col("x"), col("_l")).agg(count(lit(1)).as("_kin"))
      // Σtot per community
      val tot = lab.join(deg, lab("_id") === deg("x"), "left")
        .groupBy("_l").agg(sum(coalesce(col("_k"), lit(0L))).as("_tot"))
      // ensure the CURRENT community is always a candidate (k_i→cur may
      // be 0 when no neighbor shares it)
      val cur = lab.select(col("_id").as("x"), col("_l").as("_lcur"))
      val kinCur = kin.join(cur, "x") // (x, _l, _kin, _lcur)
      val curMissing = cur
        .join(kinCur.where(col("_l") === col("_lcur")).select("x"),
          Seq("x"), "left_anti")
        .select(col("x"), col("_lcur").as("_l"), lit(0L).as("_kin"),
          col("_lcur"))
      val cand = kinCur.unionByName(curMissing)
      val scored = cand
        .join(deg, "x")
        .join(tot, "_l")
        .select(col("x"), col("_l"), col("_lcur"),
          (m2.cast("decimal(38,0)") * col("_kin") -
            col("_k").cast("decimal(38,0)") *
              (col("_tot") - when(col("_l") === col("_lcur"), col("_k"))
                .otherwise(lit(0L)))).as("_score"))
      // r10 (guide §2.4): best-candidate and current-community score in
      // ONE partial-aggregated pass — the row_number() Window forced a
      // full (x, score, l) sort with no map-side combine, and the
      // separate curScore branch re-executed the whole scored subtree
      // (kin + tot + two joins) a second time. min(struct(-score, l))
      // reproduces the Window's (score DESC, l ASC) ordering exactly:
      // decimal negation is exact, ties fall to the smallest label.
      // The current-community row always exists (curMissing above), so
      // max(when(_l = _lcur, score)) is total, like the old join.
      val agg = scored.groupBy("x").agg(
        min(struct((-col("_score")).as("_ns"), col("_l"))).as("_b"),
        max(when(col("_l") === col("_lcur"), col("_score"))).as("_scur"))
      val moved = agg
        .join(cur, "x")
        .select(col("x").as("_id"),
          when((-col("_b._ns")) > col("_scur"), col("_b._l"))
            .otherwise(col("_lcur")).as("_l"))
      // isolated nodes have no scored row, and only this round's phase
      // may move — everyone else keeps their label
      lab = lab.join(moved, Seq("_id"), "left")
        .select(lab("_id"),
          when(lab("_ph") === lit(round % 2),
            coalesce(moved("_l"), lab("_l"))).otherwise(lab("_l")).as("_l"),
          lab("_ph"))
        .cutLineage(false)
    }
    und.unpersist()
    deg.unpersist()
    lab.select(col("_id").as(idCol), col("_l").as("label"))
  }

  /** Louvain phase 2: coarsen the graph onto a community partition —
    * one weighted supernode edge per community pair, the within-
    * community edge mass as self-loops (ca = cb), so total edge weight
    * is conserved and modularity computed on the coarse graph equals
    * the fine graph's. Feed the result back through [[louvainRounds]]
    * (weights folded via edge multiplicity) or [[pageRankWeightedPpb]]
    * for community-level centrality. Edges with an unlabeled endpoint
    * drop ([[modularity]]'s document-don't-guess rule); reversed /
    * duplicate / self pairs collapse first.
    *
    * Scale shape: two id-keyed label joins + one (ca, cb) partial-agg
    * count — no iteration. Returns (ca, cb, weight), ca <= cb. */
  def louvainCoarsen(pairs: DataFrame, labels: DataFrame,
      idCol: String, labelCol: String,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    val e = pairs
      .select(least(col(aCol), col(bCol)).as("x"),
        greatest(col(aCol), col(bCol)).as("y"))
      .where(col("x") =!= col("y")).distinct()
    val la = labels.select(col(idCol).as("x"), col(labelCol).as("_lx"))
    val lb = labels.select(col(idCol).as("y"), col(labelCol).as("_ly"))
    e.join(la, "x").join(lb, "y")
      .select(least(col("_lx"), col("_ly")).as("ca"),
        greatest(col("_lx"), col("_ly")).as("cb"))
      .groupBy("ca", "cb").agg(count(lit(1)).as("weight"))
  }

  /** Deterministic uniform random walks (the DeepWalk/node2vec p=q=1
    * corpus generator): `walksPerNode` walks of `walkLength` steps from
    * each start node, each step drawn by the engine-portable splitmix64
    * chain — draw(start, walk, step) = splitmix64((start << 8) | (walk
    * << 4) | step, seed) mod deg(cur), neighbor = that index into the
    * (dst ascending) adjacency rank. No RNG state: the walk corpus is a
    * pure function of (graph, seed), layout-invariant, replayable
    * step-for-step by an external SQL engine, and incrementally
    * extendable (same keys → same prefix).
    *
    * Scale shape: the adjacency is ranked ONCE (per-src row_number —
    * partitions bounded by max degree); each of the L steps is one
    * frontier ⋈ degree ⋈ adjacency equi-join on the node key, so the
    * total work is O(L·|walks|) join rows with no global structure.
    * Walks stop early at sink nodes (no out-edges). In-plan guards
    * reject start ids outside [0, 2^55) — the key packing bound
    * (the negativeSamples rule); walksPerNode ≤ 16 and walkLength ≤ 15
    * keep the packed nibbles disjoint.
    *
    * Returns (`start`, `walk`, `step`, `node`) with step 0 = start. */
  def randomWalks(edges: DataFrame, srcCol: String, dstCol: String,
      starts: DataFrame, idCol: String, walksPerNode: Int, walkLength: Int,
      seed: Long = 0L): DataFrame = {
    require(walksPerNode >= 1 && walksPerNode <= 16,
      s"walksPerNode in [1, 16], got $walksPerNode")
    require(walkLength >= 1 && walkLength <= 15,
      s"walkLength in [1, 15], got $walkLength")
    val adj = edges.select(col(srcCol).cast("long").as("_src"),
        col(dstCol).cast("long").as("_dst"))
      .where(col("_src").isNotNull && col("_dst").isNotNull).distinct()
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("_src").orderBy("_dst")))
    val deg = adj.groupBy("_src").agg(count(lit(1)).as("_deg"))
    val s0 = starts.select(col(idCol).cast("long").as("start"))
      .where(col("start").isNotNull).distinct()
      .select(when(col("start") < 0L || col("start") >= (1L << 55),
          raise_error(concat(lit("randomWalks start id out of [0, 2^55): "),
            col("start").cast("string"))))
        .otherwise(col("start")).as("start"),
        explode(sequence(lit(0), lit(walksPerNode - 1))).as("walk"))
      .select(col("start"), col("walk"), lit(0).as("step"),
        col("start").as("node"))
    var frontier = s0
    val out = scala.collection.mutable.ArrayBuffer[DataFrame](s0)
    for (step <- 1 to walkLength) {
      val key = shiftleft(col("start"), 8) +
        col("walk").cast("long") * 16L + lit(step.toLong)
      frontier = frontier
        .join(deg.select(col("_src").as("node"), col("_deg")), Seq("node"))
        .withColumn("_idx",
          pmod(graft.functions.splitmix64_rank(key, seed), col("_deg"))
            .cast("int") + 1)
        .join(adj, col("node") === col("_src") && col("_idx") === col("_rk"))
        .select(col("start"), col("walk"), lit(step).as("step"),
          col("_dst").as("node"))
      out += frontier
    }
    out.reduce(_.unionByName(_))
  }

  /** Directed co-occurrence PMI over a walk corpus ([[randomWalks]]
    * output): adjacent-step (node_t → node_t+1) pairs counted exactly,
    * margins and total off the SAME pair table, pmi_ppb = one ln of
    * the exact count ratio quantized once to ppb (the q194 rule). The
    * DeepWalk/node2vec factorization target — feed the positive PMI
    * rows into [[graft.operators.LangModel]] word-vector machinery or
    * export as edge features.
    *
    * Scale shape: one self-equi-join of the walk table on (start,
    * walk, step+1) + three bounded count aggregations — everything
    * keyed, nothing global. Returns (a, b, c_ab, m_a, m_b, t,
    * pmi_ppb). */
  def walkPairsPmi(walks: DataFrame): DataFrame = {
    val a = walks.select(col("start"), col("walk"), col("step"),
      col("node").as("a"))
    val b = walks.select(col("start"), col("walk"),
      (col("step") - 1).as("step"), col("node").as("b"))
    val cnt = a.join(b, Seq("start", "walk", "step"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val ma = cnt.groupBy("a").agg(sum("c_ab").as("m_a"))
    val mb = cnt.groupBy("b").agg(sum("c_ab").as("m_b"))
    val tot = cnt.agg(sum("c_ab").as("t"))
    cnt.join(ma, "a").join(mb, "b").crossJoin(broadcast(tot))
      .withColumn("pmi_ppb",
        round(log(col("c_ab").cast("double") * col("t").cast("double") /
          (col("m_a").cast("double") * col("m_b").cast("double"))) * lit(1e9))
          .cast("long"))
      .select("a", "b", "c_ab", "m_a", "m_b", "t", "pmi_ppb")
  }
}
