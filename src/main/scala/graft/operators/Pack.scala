package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for LLM pretraining batches: concatenate documents in
  * a deterministic (id) order and cut the global token stream into
  * fixed-size blocks — the GPT-style "block packing" step that turns a
  * deduplicated/filtered corpus into training rows. Per document we emit
  * its exclusive start offset in the stream and the first/last block it
  * lands in (a document may straddle a block boundary; that is the
  * intended semantics of concat-then-cut packing).
  *
  * Scale design — the naive formulation is `sum(n) OVER (ORDER BY id)`,
  * which Spark executes as a single-partition Window (the WindowExec
  * "No Partition Defined" trap). Instead we compute a distributed prefix
  * sum in two passes over a range-partitioned, locally-sorted projection:
  *   1. per-partition token totals (nPartitions longs — KBs at any corpus
  *      size) collected to the driver and scanned into exclusive
  *      partition offsets;
  *   2. a partition-local cumulative sum seeded with the partition's
  *      offset, emitted via mapPartitionsWithIndex.
  * Both passes recompute the same deterministic lineage (exactly the
  * contract `RDD.zipWithIndex` relies on); nothing is cached, nothing
  * big ever reaches the driver. The result is partitioning-invariant:
  * start_off is "total tokens of all smaller ids" regardless of where
  * the range boundaries fall (ids must be unique).
  */
object Pack {

  /** @param idCol      unique, orderable id column (cast to long)
    * @param nTokensCol per-doc token count column (cast to long)
    * @param blockSize  tokens per training block (e.g. 2048)
    * @return (id, n_tokens, start_off, first_block, last_block), one row
    *         per input row; empty docs (n_tokens = 0) occupy no tokens
    *         and report first_block = last_block = the block they start
    *         at. */
  def packBlocks(df: DataFrame, idCol: String, nTokensCol: String,
                 blockSize: Long, numPartitions: Int = 0): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    val sorted = df
      .select(col(idCol).cast("long").as("_id"),
        col(nTokensCol).cast("long").as("_n"))
      .repartitionByRange(parts, col("_id"))
      .sortWithinPartitions("_id")

    // pass 1: per-partition totals (tiny), scan into exclusive offsets
    val partSums = sorted.rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(1))
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)

    // pass 2: partition-local cumsum seeded with the partition offset
    val rows = sorted.rdd.mapPartitionsWithIndex { case (i, it) =>
      var off = bc.value(i)
      it.map { r =>
        val start = off
        off += r.getLong(1)
        Row(r.getLong(0), r.getLong(1), start)
      }
    }
    val packed = spark.createDataFrame(rows, StructType(Seq(
      StructField("_id", LongType), StructField("n_tokens", LongType),
      StructField("start_off", LongType))))

    packed.select(
      col("_id").as(idCol),
      col("n_tokens"),
      col("start_off"),
      (col("start_off") / blockSize).cast("long").as("first_block"),
      when(col("n_tokens") > 0,
        ((col("start_off") + col("n_tokens") - 1) / blockSize).cast("long"))
        .otherwise((col("start_off") / blockSize).cast("long"))
        .as("last_block"))
  }

  /** The inverse of [[packBlocks]]: split each document into overlapping
    * token windows — the context-window chunking step of RAG ingestion
    * and long-document training prep. Chunk starts step by
    * `window - overlap`; the final chunk may be short (whatever tokens
    * remain); docs that tokenize to nothing emit no rows.
    *
    * Entirely codegen'd builtins (tokenize → `sequence` of starts →
    * `posexplode` → `slice`): one narrow explode, no shuffle at all —
    * the plan is a single WholeStageCodegen span over the scan, so it
    * runs at parquet-scan speed on any corpus size.
    *
    * @return (idCol, `chunk_idx`, `start_tok`, `n_chunk_tokens`,
    *         `chunk_text`) — chunk_text re-joined with single spaces
    *         (token-level chunking is normalization-lossy by design). */
  def chunkTokens(df: DataFrame, idCol: String, textCol: Column,
      window: Int, overlap: Int = 0): DataFrame = {
    require(window >= 1 && overlap >= 0 && overlap < window,
      s"need 0 <= overlap < window, got window=$window overlap=$overlap")
    val step = window - overlap
    df.where(graft.functions.has_min_tokens(textCol, 1))
      .select(col(idCol),
        graft.functions.TextFunctions.tokens(textCol).as("_l"))
      .select(col(idCol), col("_l"),
        posexplode(sequence(lit(0), size(col("_l")) - 1, lit(step)))
          .as(Seq("chunk_idx", "_start")))
      .select(col(idCol), col("chunk_idx"),
        col("_start").cast("long").as("start_tok"),
        slice(col("_l"), col("_start") + 1, lit(window)).as("_c"))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        size(col("_c")).as("n_chunk_tokens"),
        array_join(col("_c"), " ").as("chunk_text"))
  }

  /** Next-item training examples from event sequences: per key, ordered
    * by `orderCols` (include a unique tiebreaker for determinism), each
    * position ≥ 2 yields (context = up to `contextLen` preceding items
    * in order, label = the item) — the sliding-window example generator
    * of sequential-recommendation / session-LM training.
    *
    * Scale shape: ONE key-partitioned window (sequences are per-user
    * bounded; heavy keys are a data problem, not a plan problem — cap
    * upstream if a key can be unbounded), no self-join, no explode of
    * the full sequence per position. Returns (keyCol, pos, context
    * array, label). */
  def sequenceExamples(events: DataFrame, keyCol: String,
      orderCols: Seq[Column], itemCol: Column,
      contextLen: Int): DataFrame = {
    require(contextLen >= 1, s"contextLen must be >= 1, got $contextLen")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    events
      .withColumn("_pos", row_number().over(w))
      .withColumn("_ctx", collect_list(itemCol)
        .over(w.rowsBetween(-contextLen, -1)))
      .where(col("_pos") > 1)
      .select(col(keyCol), col("_pos").as("pos"), col("_ctx").as("context"),
        itemCol.as("label"))
  }

  /** Small-files compaction planner — the lakehouse maintenance step a
    * 100 TB table needs continuously: group files (atomic — never
    * split) into merge jobs of ~`targetBytes` each. Greedy sequential
    * grouping in (id) order: a file joins the group its exclusive
    * byte offset falls in (group = start_off div target — the
    * [[packBlocks]] prefix sum reused verbatim, so the plan is
    * layout-invariant and two-pass distributed, never a 1-partition
    * window). A group's bytes exceed `targetBytes` only by its last
    * straddling file; a single file ≥ target flags `has_oversize`
    * (already compact — rewrite is wasted IO). Returns one row per
    * merge job: (grp, n_files, bytes, largest, has_oversize). */
  def compactionGroups(files: DataFrame, idCol: String, sizeCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes >= 1L, s"targetBytes must be >= 1, got $targetBytes")
    packBlocks(files, idCol, sizeCol, targetBytes)
      .groupBy(col("first_block").as("grp"))
      .agg(count(lit(1)).as("n_files"), sum("n_tokens").as("bytes"),
        max("n_tokens").as("largest"),
        (max("n_tokens") >= targetBytes).as("has_oversize"))
  }

  /** Padding-waste report for pad-to-max batching — the sizing study
    * behind length-grouped batching (HF `group_by_length`): when every
    * batch pads to its longest member, how many pad tokens does each
    * batching order burn? Compares two deterministic strategies over
    * the same corpus:
    *
    *   - `arrival`: batches cut from the (id) order — what a naive
    *     loader does;
    *   - `sorted`: batches cut from the (n_tokens desc, id) order —
    *     length grouping, the cheap 90%-of-optimal fix.
    *
    * Each strategy is ONE [[graft.operators.GroupOps.globalOrderIndex]]
    * rank (range-partitioned, never a 1-partition sort), batch =
    * rank div batchSize, then one hash agg per batch and one rollup —
    * all counts exact longs; waste_ppm = ((padded−real)·10⁶) div padded
    * exact floor division. Empty docs pad like any other member (the
    * pad-to-max semantics). Returns one row per strategy: (strategy,
    * n_docs, n_batches, real_tokens, padded_tokens, waste_ppm). */
  def paddingWaste(df: DataFrame, idCol: String, nTokensCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val base = df.select(col(idCol).as("_id"),
        col(nTokensCol).cast("long").as("_n"))
      .where(col("_n").isNotNull)
    def strategy(name: String, sortCols: Column*): DataFrame = {
      val idx = graft.operators.GroupOps.globalOrderIndex(
        base, "_gi", sortCols: _*)
      idx.withColumn("_batch", expr(s"_gi div $batchSize"))
        .groupBy("_batch")
        .agg(count(lit(1)).as("_cnt"), max("_n").as("_max"),
          sum("_n").as("_real"))
        .agg(count(lit(1)).as("n_batches"),
          sum("_cnt").as("n_docs"),
          sum("_real").as("real_tokens"),
          sum(col("_max") * col("_cnt")).as("padded_tokens"))
        .select(lit(name).as("strategy"), col("n_docs"), col("n_batches"),
          col("real_tokens"), col("padded_tokens"))
    }
    strategy("arrival", col("_id"))
      .unionByName(strategy("sorted", (-col("_n")).as("_nn"), col("_id")))
      .withColumn("waste_ppm", when(col("padded_tokens") > 0L,
        expr("((padded_tokens - real_tokens) * 1000000) div padded_tokens")))
  }
}
