package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Brute-force exact k-nearest-neighbor search — the reference's
  * `da.find(query_embeddings)` / `da.match(other)` re-expressed as one
  * declarative Spark plan (reference: docarray/array/mixins/find.py:88-249
  * dispatch, docarray/array/storage/memory/find.py:17-115 kernel,
  * docarray/array/mixins/match.py:12-92 writeback).
  *
  * Physical shape (the 100 TB-scale path):
  *   docs  ──[broadcast nested-loop join with the (small) query side]──▶
  *   codegen'd `VectorDistance` per pair ──▶ `TopKByDistance` bounded-heap
  *   aggregate (map-side partial per partition, heap-merge on shuffle).
  *
  * The cross product is *pipelined*, never materialized: each doc partition
  * streams against the broadcast query table and only O(partitions × Q × k)
  * rows reach the shuffle. No Window sort over N×Q rows, no collect.
  */
object Knn {

  /** For each row of `queries`, the k nearest rows of `docs`.
    *
    * @return columns: `query_id` (original query id type), `id` (doc id
    *         type), `distance` (double), `rank` (1-based, ascending
    *         distance).
    * @param excludeSelf drop hits whose id equals the query id
    *        (reference: find.py:174,237-243 — done there via limit+1 and
    *        trim; here a join anti-condition *before* the top-k, cleaner).
    * @param normalization optional (a,b) min-max rescale of distances,
    *        computed over the FULL per-query distance row, not just the
    *        top-k — matching reference memory/find.py:109-114.
    */
  def bruteForce(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      metric: String = "cosine",
      docId: String = "id",
      docVec: String = "embedding",
      queryId: String = "id",
      queryVec: String = "embedding",
      excludeSelf: Boolean = false,
      normalization: Option[(Double, Double)] = None): DataFrame = {

    val d = docs.select(col(docId).as("_did"), col(docVec).as("_dvec"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("_qvec"))

    var pairs = d.crossJoin(broadcast(q))
    if (excludeSelf) pairs = pairs.where(col("_did") =!= col("query_id"))

    val dist = vector_distance(col("_dvec"), col("_qvec"), metric)

    val aggCols = Seq(topk_by_distance(dist, col("_did"), k).as("_topk")) ++
      (if (normalization.isDefined)
         Seq(min(dist).as("_dmin"), max(dist).as("_dmax"))
       else Nil)

    val grouped = pairs.groupBy("query_id").agg(aggCols.head, aggCols.tail: _*)

    val keep = if (normalization.isDefined) Seq("query_id", "_dmin", "_dmax")
               else Seq("query_id")
    val exploded = grouped.select(
      keep.map(col) :+ posexplode(col("_topk")).as(Seq("_pos", "_hit")): _*)

    val distOut = normalization match {
      case Some((a, b)) =>
        // min-max rescale to [a, b] over the full row (math/helper.py:6-37)
        lit(a) + (col("_hit.distance") - col("_dmin")) * (lit(b) - lit(a)) /
          (col("_dmax") - col("_dmin"))
      case None => col("_hit.distance")
    }

    exploded.select(
      col("query_id"),
      col("_hit.value").as("id"),
      distOut.as("distance"),
      (col("_pos") + 1).cast("int").as("rank"))
  }

  /** knn + writeback: returns `left` with a `matches` column —
    * array<struct<id, distance, rank>> ascending by distance — the
    * reference's `da.match(darray)` (reference: match.py:12-92; ordering
    * memory/find.py:176-179). Old matches are replaced wholesale, like the
    * reference clearing before write (match.py:70-71). */
  def attachMatches(
      left: DataFrame,
      right: DataFrame,
      k: Int,
      metric: String = "cosine",
      leftId: String = "id",
      leftVec: String = "embedding",
      rightId: String = "id",
      rightVec: String = "embedding",
      excludeSelf: Boolean = false): DataFrame = {

    val hits = bruteForce(right, left, k, metric,
      docId = rightId, docVec = rightVec,
      queryId = leftId, queryVec = leftVec,
      excludeSelf = excludeSelf)

    val matches = hits
      .groupBy("query_id")
      .agg(array_sort(collect_list(struct(
        col("rank"), col("id"), col("distance")))).as("matches"))

    left.drop("matches").join(
      matches.withColumnRenamed("query_id", "_qid"),
      col(leftId) === col("_qid"), "left")
      .drop("_qid")
  }
}
