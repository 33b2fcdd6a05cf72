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
    df.select(col(idCol),
        graft.functions.TextFunctions.tokens(textCol).as("_l"))
      .where(size(col("_l")) > 0)
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
}
