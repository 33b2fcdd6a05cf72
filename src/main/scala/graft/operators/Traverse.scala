package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Traversal-path engine over the nested representation — the reference's
  * `da.traverse/traverse_flat/flatten` path DSL
  * (reference: docarray/array/mixins/traverse.py:16-52 grammar,
  * :110-154 walker, :197-228 flatten).
  *
  * Paths: `r` = root, `c` = chunks, `m` = matches, chains like `cc`, `cm`;
  * per-step slices `c[1:3]`; multimodal attribute steps `.[image]` /
  * `.[image,banner]` (traverse.py:30-36 ATTRIBUTE grammar) resolving
  * through the per-row `_metadata['multi_modal_schema']` position map
  * (see [[Modalities.pack]]); comma-separated alternatives. Each step
  * lowers to an `explode` of the corresponding array<struct> column — a
  * generator, not a shuffle — so traversal is embarrassingly parallel.
  *
  * Deep/unbounded nesting should use the normalized flat table
  * (id, parent_id, granularity) and iterate a self-join per level — see
  * [[graft.schema.DocSchema]].
  */
object Traverse {

  private val step =
    raw"(c|m|\.\[([A-Za-z_][A-Za-z0-9_]*(?:,[A-Za-z_][A-Za-z0-9_]*)*)\])(?:\[(-?\d*):(-?\d*)\])?".r

  /** Documents at one traversal path, e.g. "c", "cc", "m", "cm", "c[0:2]",
    * "r.[image]" (multimodal attribute step). */
  def traverse(nested: DataFrame, path: String): DataFrame = {
    val trimmed = path.stripPrefix("@").trim
    if (trimmed == "r" || trimmed.isEmpty) nested
    else {
      val steps = step.findAllMatchIn(
        if (trimmed.startsWith("r")) trimmed.drop(1) else trimmed).toSeq
      steps.foldLeft(nested) { (df, m) =>
        val arr0 = m.group(1) match {
          case "c" => col("chunks")
          case "m" => col("matches")
          case _ =>
            // attribute step: chunk positions come from the row's compiled
            // multi_modal_schema map, so the lookup is per-row dynamic
            val names = m.group(2).split(',')
            val picks = names.toSeq.map { n =>
              element_at(col("chunks"),
                get_json_object(
                  element_at(col("_metadata"), "multi_modal_schema"),
                  "$." + n).cast("int") + 1)
            }
            filter(array(picks: _*), c => c.isNotNull)
        }
        val arr = (Option(m.group(3)).filter(_.nonEmpty),
                   Option(m.group(4)).filter(_.nonEmpty)) match {
          case (None, None) => arr0
          case (start, end) =>
            val s = start.map(_.toInt).getOrElse(0)
            val e = end.map(_.toInt).getOrElse(Int.MaxValue)
            // python slice [s:e) with non-negative bounds → 1-based slice()
            slice(arr0, s + 1, math.max(e - s, 0))
        }
        df.where(size(arr) > 0)
          .select(explode(arr).as("_d"))
          .select(col("_d.*"))
      }
    }
  }

  /** traverse_flat: union of leaves over comma-separated paths
    * (reference: traverse.py:156-195). Columns are aligned by name; levels
    * lacking chunks/matches columns get empty arrays. */
  def traverseFlat(nested: DataFrame, paths: String): DataFrame =
    paths.split(',').map(_.trim).filter(_.nonEmpty)
      .map(p => traverse(nested, p))
      .reduce(_.unionByName(_, allowMissingColumns = true))

  /** Write-back through a traversal path — `da['@c'] = docs`
    * (reference: array/mixins/setitem.py:72-75 → `_set_doc_value_pairs`).
    * The reference pairs flattened leaves with values by position; the
    * distributable equivalent is by id: every doc reached by `path` whose
    * id appears in `updates` is replaced by the `updates` row, and the
    * nested column is reconstructed with sibling order preserved.
    *
    * `updates` must carry the same columns as the leaf documents (a full
    * replacement row per id). Plan shape per level: posexplode → leaf
    * left-join (broadcast-able when updates are small) → groupBy parent +
    * sorted collect_list — one shuffle per nesting level, no driver loop.
    */
  def setByPath(nested: DataFrame, path: String, updates: DataFrame,
      idCol: String = "id"): DataFrame = {
    val trimmed = path.stripPrefix("@").trim
    val steps = (if (trimmed.startsWith("r")) trimmed.drop(1) else trimmed)
      .toSeq.map {
        case 'c' => "chunks"
        case 'm' => "matches"
        case bad => throw new IllegalArgumentException(
          s"setByPath supports c/m chains, got '$bad' in $path")
      }
    require(steps.nonEmpty, s"empty write-back path: $path")
    rebuildLevel(nested, steps, updates, idCol)
  }

  private def rebuildLevel(df: DataFrame, steps: Seq[String],
      updates: DataFrame, idCol: String): DataFrame = {
    val arrCol = steps.head
    val kids0 = df
      .select(col(idCol).as("_pid"), posexplode(col(arrCol)).as(Seq("_pos", "_d")))
      .select(Seq(col("_pid"), col("_pos")) ++
        df.select(col(arrCol)).schema.fields.head.dataType
          .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
          .asInstanceOf[org.apache.spark.sql.types.StructType]
          .fieldNames.toSeq.map(f => col("_d").getField(f).as(f)): _*)
    val kidCols = kids0.columns.filterNot(c => c == "_pid" || c == "_pos").toSeq
    val kids =
      if (steps.tail.nonEmpty)
        rebuildLevel(kids0, steps.tail, updates, idCol)
      else {
        // leaf level: replace whole rows whose id matches an updates row
        val up = updates.select(
          col(idCol).as("_uid"),
          struct(kidCols.map(col): _*).as("_new"))
        kids0.join(up, kids0(idCol) === up("_uid"), "left")
          .select(col("_pid"), col("_pos"),
            coalesce(col("_new"), struct(kidCols.map(col): _*)).as("_d"))
          .select(Seq(col("_pid"), col("_pos")) ++
            kidCols.map(f => col("_d").getField(f).as(f)): _*)
      }
    // `_rb_pid` (not `_pid`) so the join+drop can't collide with an outer
    // recursion level's own `_pid` marker
    // sort by _pos alone via an explicit comparator: the default
    // array_sort orders the whole struct, which fails with an
    // AnalysisException when kid fields are map-typed (tags, scores, …)
    val rebuilt = kids
      .groupBy("_pid")
      .agg(array_sort(
        collect_list(struct(col("_pos") +: kidCols.map(col): _*)),
        (l, r) => when(l("_pos") < r("_pos"), -1)
          .when(l("_pos") > r("_pos"), 1).otherwise(0)).as("_sorted"))
      .select(col("_pid").as("_rb_pid"),
        transform(col("_sorted"),
          e => struct(kidCols.map(f => e.getField(f).as(f)): _*)).as("_arr"))
    df.join(rebuilt, df(idCol) === rebuilt("_rb_pid"), "left")
      .withColumn(arrCol, coalesce(col("_arr"), col(arrCol)))
      .drop("_rb_pid", "_arr")
  }

  /** Re-nest a normalized parent-child hierarchy — the inverse of
    * [[flatten]] over the (id, parent_id, granularity) flat-table
    * design ([[graft.schema.DocSchema]]). `levels` is root level first,
    * leaves last; every non-root level carries `parentCol` pointing at
    * the level above, plus arbitrary payload columns that ride into the
    * structs. Depth is DATA (`levels.length`), not code: each fold step
    * is the same equi-join on the parent key + one sorted collect_list
    * — one shuffle per level, no driver loop, any depth. Parents with
    * no children drop (inner join), matching the reference's walker
    * which never surfaces childless branches on a chunk path. Children
    * sort by full struct ascending — with unique ids leading each
    * struct this is a pure id sort. */
  def nest(levels: Seq[DataFrame], idCol: String = "id",
      parentCol: String = "parent_id"): DataFrame = {
    require(levels.size >= 2, s"nest needs >= 2 levels, got ${levels.size}")
    levels.reduceRight { (parent, childNested) =>
      val payload = childNested.columns.filterNot(_ == parentCol).toSeq
      val parentCols = parent.columns.toSeq
      parent
        .join(childNested.select(col(parentCol).as("_nest_k"),
          struct(payload.map(col): _*).as("_nest_c")),
          parent(idCol) === col("_nest_k"))
        .groupBy(parentCols.map(parent(_)): _*)
        .agg(array_sort(collect_list(col("_nest_c"))).as("chunks"))
    }
  }

  /** flatten: all nesting levels as one table, deduped by id
    * (reference: traverse.py:197-228). Iteratively explodes to `depth`. */
  def flatten(nested: DataFrame, depth: Int = 2): DataFrame = {
    val hasNesting = nested.columns.contains("chunks") || nested.columns.contains("matches")
    if (!hasNesting || depth == 0) nested
    else {
      val levels = scala.collection.mutable.ArrayBuffer[DataFrame]()
      var cur = nested
      var d = 0
      var continue = true
      while (continue && d <= depth) {
        levels += cur
        val nextCols = Seq("chunks", "matches").filter(cur.columns.contains)
        if (nextCols.isEmpty || d == depth) continue = false
        else {
          val subs = nextCols.map(c =>
            cur.where(size(col(c)) > 0).select(explode(col(c)).as("_d")).select(col("_d.*")))
          cur = subs.reduce(_.unionByName(_, allowMissingColumns = true))
          d += 1
        }
      }
      levels.map(l => l.drop("chunks").drop("matches"))
        .reduce(_.unionByName(_, allowMissingColumns = true))
        .dropDuplicates("id")
    }
  }
}
