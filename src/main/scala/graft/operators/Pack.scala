package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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
}
