package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference is a batch engine — its
  * closest concept is `dataloader` streaming batches from a binary file
  * (reference: docarray/array/mixins/dataloader/__init__.py:12,
  * dataloader/helper.py:11-70). Here the same event tables become real
  * streams: file-source ingestion, watermarked windowed aggregation, and
  * stateful sessionization via flatMapGroupsWithState.
  */
object EventStream {

  /** Schema of the testdata events table with `ts` as long nanos. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Normalize an events frame so `ts` is long NANOSECONDS whatever the
    * parquet physical type was: TIMESTAMP(NANOS) already arrives as long
    * under the legacy conf; TIMESTAMP(MICROS) arrives as a (NTZ)
    * timestamp and is converted wall-clock-as-UTC ×1000 — the same
    * convention DuckDB's epoch_ns() applies, so oracles agree. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df
    case _ => df.withColumn("ts",
      unix_micros(col("ts").cast("timestamp")) * lit(1000L))
  }

  /** Batch read of an events parquet path with `ts` as long nanos. */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(path))
  }

  /** readStream over a directory of event parquet files. File streams
    * need a declared schema, and the generator has shipped `ts` as both
    * TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across rounds — peek at one
    * existing file (batch, driver-side, metadata-only) to pick the
    * physical ts type, then normalize to long nanos post-read. */
  def fromDirectory(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val evFile = new java.io.File(dir, "events.parquet")
    val peek = if (evFile.exists) evFile.getPath else dir
    val tsType = spark.read.parquet(peek).schema("ts").dataType
    val schema = StructType(eventSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    normalizeTs(spark.readStream.schema(schema).parquet(dir))
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
  }

  /** Watermarked tumbling-window counts per event type. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** Streaming exact dedup: drop re-arrivals of the same content hash
    * within the watermark horizon — the bounded-state streaming twin of
    * `Dedup.exact` (state is pruned once the watermark passes, so memory
    * is bounded by the horizon's arrival rate). */
  def streamingDedupe(stream: DataFrame, contentCols: Seq[String],
      eventTimeCol: String, watermark: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, sha2, concat_ws}
    stream
      .withColumn("_content_key",
        sha2(concat_ws("", contentCols.map(col): _*), 256))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("_content_key")
      .drop("_content_key")
  }

  /** Streaming incremental ingest dedup: pass through only stream rows
    * whose key is absent from the static `corpus` — the streaming twin of
    * `Dedup.newAgainstCorpus`. A stream-static LEFT ANTI equi-join: the
    * static side is planned per micro-batch (so a growing corpus table is
    * re-read), no streaming state at all. Combine with
    * [[streamingDedupe]] to also drop within-stream re-arrivals. */
  def streamingNewAgainstCorpus(stream: DataFrame, corpus: DataFrame,
      streamKey: org.apache.spark.sql.Column,
      corpusKey: org.apache.spark.sql.Column): DataFrame =
    stream.join(corpus.select(corpusKey.as("_corpus_key")).distinct(),
      streamKey === org.apache.spark.sql.functions.col("_corpus_key"),
      "left_anti")

  /** Streaming knn: score a stream of query vectors against a static doc
    * table — stream-static cross join (docs broadcast) + the same bounded
    * top-k aggregate, in update mode. The streaming twin of `find()`. */
  def streamingKnn(queryStream: DataFrame, docs: DataFrame, k: Int,
      metric: String = "cosine",
      queryId: String = "id", queryVec: String = "embedding",
      docId: String = "id", docVec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import graft.functions._
    val d = docs.select(col(docId).as("_did"), col(docVec).as("_dvec"))
    queryStream
      .select(col(queryId).as("query_id"), col(queryVec).as("_qvec"))
      .crossJoin(broadcast(d))
      .groupBy("query_id")
      .agg(topk_by_distance(
        vector_distance(col("_dvec"), col("_qvec"), metric),
        col("_did"), k).as("matches"))
  }

  /** Stream-stream interval join: each left event pairs with right events
    * of the same key whose event time lies in
    * [left − before, left + after]. Both sides are watermarked, so join
    * state is bounded — Spark evicts buffered rows once the watermark
    * passes the interval. Inner join → append mode. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      before: String = "10 minutes", after: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark(leftTime, watermark).alias("l")
    val r = right.withWatermark(rightTime, watermark).alias("r")
    l.join(r, expr(
      s"""l.$key = r.$key AND
          r.$rightTime >= l.$leftTime - INTERVAL $before AND
          r.$rightTime <= l.$leftTime + INTERVAL $after"""))
  }

  case class SessionEvent(user_id: Long, ts: Long)
  case class SessionState(start: Long, last: Long, n: Int)
  case class SessionOut(user_id: Long, start: Long, end: Long, n_events: Int)

  /** Stateful sessionization: emit a session row when a user is idle
    * longer than `gapNanos` — custom state via flatMapGroupsWithState,
    * the streaming twin of the batch gaps-and-islands query
    * (SparkEntry q16_sessions). */
  def sessionize(events: Dataset[SessionEvent], gapNanos: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.ts)
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.ts - s.last > gapNanos =>
                out += SessionOut(userId, s.start, s.last, s.n)
                cur = Some(SessionState(e.ts, e.ts, 1))
              case Some(s) =>
                cur = Some(s.copy(last = e.ts, n = s.n + 1))
              case None =>
                cur = Some(SessionState(e.ts, e.ts, 1))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  case class FunnelEvent(user_id: Long, event_type: String, ts: Long)
  case class FunnelState(times: Seq[Long])
  case class FunnelUpdate(user_id: Long, depth: Int, times: Seq[Long])

  /** Streaming funnel — the continuous twin of
    * [[graft.operators.Funnel.funnelUsers]], under the standard
    * streaming-funnel delivery contract: events may arrive in any order
    * WITHIN a micro-batch (each batch is sorted per user before the
    * state update), but a later batch must not carry an event older
    * than an already-consumed step time — such stragglers are ignored
    * rather than re-anchoring history (exactly-once advancement, state
    * = at most |steps| longs per user, bounded forever).
    *
    * Under in-order delivery the scan-in-ts-order rule IS the batch
    * earliest-completion rule: the first feasible step-(i+1) event
    * after tᵢ is its minimum. Emits each user's (depth, times) once
    * per batch (Update mode). */
  def streamingFunnel(events: Dataset[FunnelEvent], steps: Seq[String],
      windowNs: Long = Long.MaxValue): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be non-empty and distinct: $steps")
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelUpdate](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_type))
          var times = state.getOption.map(_.times).getOrElse(Seq.empty)
          sorted.foreach { e =>
            val depth = times.length
            if (depth < steps.length && e.event_type == steps(depth)) {
              val ok =
                if (depth == 0) true
                else e.ts > times.last && e.ts - times.head <= windowNs
              if (ok) times = times :+ e.ts
            }
          }
          state.update(FunnelState(times))
          FunnelUpdate(uid, times.length, times)
      }
  }

  case class AttrEvent(user_id: Long, ts: Long, event_type: String,
      event_id: Long)
  case class AttrState(lastTs: Long, poisoned: Boolean,
      touches: Seq[(Long, String)])
  case class AttrCredit(user_id: Long, conv_id: Long, channel: String,
      touches: Long, credit_ppm: Long)

  /** Streaming linear multi-touch attribution — the continuous twin of
    * [[graft.operators.Funnel.linearAttribution]]: per user a bounded
    * buffer of in-window touches rides flatMapGroupsWithState, and
    * each CONVERSION event emits one row per touched channel with the
    * exact floor-div credit split (credit_ppm = count_ch · (10⁶ div
    * n)), so summing credit_ppm/touches per channel downstream
    * reproduces the batch rollup exactly on in-order streams.
    *
    * Delivery contract ([[streamingFunnel]]'s): events sort per user
    * within each micro-batch by (ts, type, id); a later batch's event
    * older than the user's last consumed ts is a straggler and is
    * IGNORED (history never re-anchors, exactly-once credit). State is
    * bounded twice over: touches older than windowNs evict on every
    * append, and a user whose LIVE in-window buffer would exceed
    * `maxUserTouches` is POISONED — all state drops and every later
    * event of that user is ignored, the streaming reading of the
    * batch valve's drop-entirely convention (forward-only: credits a
    * bot earned before crossing the cap are already emitted and stay;
    * the batch operator, seeing the whole history at once, drops them
    * too). The default matches the batch valve (`Int.MaxValue` = off,
    * parity-by-default); a LONG-RUNNING deployment should pass a
    * finite cap — with the valve off, one bot user's in-window touch
    * buffer is the state bound. */
  def streamingLinearAttribution(events: Dataset[AttrEvent],
      conversionType: String, touchTypes: Seq[String], windowNs: Long,
      maxUserTouches: Int = Int.MaxValue): Dataset[AttrCredit] = {
    import events.sparkSession.implicits._
    require(windowNs > 0, s"windowNs must be positive, got $windowNs")
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType),
      "touchTypes must be non-empty and disjoint from conversionType")
    require(maxUserTouches >= 1,
      s"maxUserTouches must be >= 1, got $maxUserTouches")
    val touchSet = touchTypes.toSet
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, AttrCredit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[AttrEvent], state: GroupState[AttrState]) =>
          var st = state.getOption
            .getOrElse(AttrState(Long.MinValue, poisoned = false, Seq.empty))
          val out = scala.collection.mutable.ArrayBuffer[AttrCredit]()
          if (!st.poisoned) {
            rows.toSeq.sortBy(e => (e.ts, e.event_type, e.event_id))
              .foreach { e =>
                if (!st.poisoned && e.ts >= st.lastTs) {
                  if (touchSet(e.event_type)) {
                    // evict expired touches first: the cap bounds the
                    // LIVE window, not all history. STRICT <: a touch at
                    // exactly ts-windowNs is still creditable by a
                    // conversion at ts (the batch join's >= bound)
                    val kept = st.touches.dropWhile(_._1 < e.ts - windowNs)
                    if (kept.length + 1 > maxUserTouches)
                      st = AttrState(e.ts, poisoned = true, Seq.empty)
                    else
                      st = AttrState(e.ts, poisoned = false,
                        kept :+ ((e.ts, e.event_type)))
                  } else if (e.event_type == conversionType) {
                    val inWin = st.touches.filter(t =>
                      t._1 < e.ts && t._1 >= e.ts - windowNs)
                    val n = inWin.length
                    if (n > 0) {
                      val per = 1000000L / n
                      inWin.groupBy(_._2).toSeq.sortBy(_._1).foreach {
                        case (ch, hits) => out += AttrCredit(uid,
                          e.event_id, ch, hits.length.toLong,
                          hits.length * per)
                      }
                    }
                    st = st.copy(lastTs = e.ts)
                  } else st = st.copy(lastTs = e.ts)
                }
              }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Streaming ANN ingest: each micro-batch of new docs is assigned to
    * its IVF cell and (PQ-)encoded with the FROZEN quantizer/codebook,
    * then appended to the persisted codes-only layout — the continuous
    * twin of the batch `assignRows`+`pqEncodeRows` ingest path. Existing
    * `_cell` shards are never rewritten (append under the same
    * partitioning), searches over `Ann.pqReadIndex(path)` see new docs at
    * the next read, and quantizer drift stays the operator's explicit
    * re-fit decision, exactly as in the batch path. Per batch this is one
    * broadcast-centroid assign + a map-side encode — no shuffle of the
    * batch, no read of the existing index. */
  /** Streaming as-of enrichment: each micro-batch of probe rows is
    * as-of-joined ([[graft.operators.AsOf.join]]) against the static
    * reference table and appended to `path` — the continuous twin of
    * the time-series enrichment join (tag each arriving event with the
    * latest reference row at-or-before it). Stateless by design: the
    * static side is re-planned per micro-batch, so a growing reference
    * table is picked up; a replayed batch appends duplicate rows —
    * downstream keys dedupe if exactly-once matters (the stateless-twin
    * contract [[streamingNewAgainstCorpus]] documents). */
  def streamingAsOfEnrich(stream: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      rightVals: Seq[String], path: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.AsOf.join(batch, right, keys, leftTime,
            rightTime, rightVals, direction, tolerance)
          .write.mode("append").parquet(path)
      }

  def streamingAnnIngest(docStream: DataFrame,
      index: graft.operators.Ann.IvfIndex,
      codebook: graft.operators.Ann.PqCodebook,
      path: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.Ann
    docStream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Ann.pqEncodeRows(index, codebook, Ann.assignRows(index, batch))
          .write.mode("append").partitionBy("_cell")
          .parquet(s"$path/coded")
      }
  }

  /** Streaming distinct-cardinality monitoring: each micro-batch is
    * sketched ([[graft.operators.Sketch.kmvSketch]]) and losslessly
    * merged into the persisted per-group bottom-k state — the continuous
    * twin of the batch KMV path. Because a KMV union is a pure function
    * of the per-part bottom-k arrays, the persisted sketch file IS the
    * whole state: restart-safe (re-read, merge, rewrite), bounded at
    * k longs per group forever, and `Sketch.kmvEstimateFromSketch` reads
    * the current estimate at any time. Per batch: one batch-local sketch
    * (the batch's distinct is micro-batch-sized) + a group-keyed merge
    * with the tiny persisted state — no unbounded streaming state store,
    * no watermark needed for an all-time cardinality. */
  def streamingKmvSketch(stream: DataFrame, groupCols: Seq[String],
      hash: org.apache.spark.sql.Column, k: Int, path: String,
      keepVersions: Int = 3): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(keepVersions >= 2, "keepVersions must be >= 2 (replay safety)")
    import graft.operators.Sketch
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val batchSk = Sketch.kmvSketch(batch, groupCols, hash, k)
        // versioned state, one dir per micro-batch: merge the latest
        // version STRICTLY OLDER than this batchId, write v<batchId>.
        // A replayed batch (restart between state write and checkpoint
        // commit) re-merges the same older version and overwrites its own
        // dir — idempotent because a KMV union is a set union. The
        // previous version is never touched, so no crash point can lose
        // the only copy of the state; versions beyond `keepVersions` are
        // pruned after a successful write (only the last in-flight batch
        // can replay, so >= 2 retained versions preserve its input).
        val merged = latestKmvVersion(spark, path, batchId) match {
          case Some(v) =>
            val prev = spark.read.parquet(s"$path/v$v")
            Sketch.kmvMerge(prev.unionByName(batchSk), groupCols, k)
          case None => batchSk
        }
        merged.write.mode("overwrite").parquet(s"$path/v$batchId")
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(p).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
          .flatMap(s => s.getPath.getName.drop(1).toLongOption.map((_, s.getPath)))
          .filter(_._1 <= batchId)
          .sortBy(-_._1).drop(keepVersions)
          .foreach { case (_, old) => fs.delete(old, true) }
      }
  }

  /** Streaming HyperLogLog state: the fixed-size (2^p registers per
    * group) twin of [[streamingKmvSketch]] — per micro-batch, sketch the
    * batch ([[graft.operators.Sketch.hllSketch]]), element-wise-max
    * merge into the latest strictly-older version, write v<batchId>.
    * Register max is idempotent, so a replayed batch (restart between
    * state write and checkpoint commit) re-merges to the identical
    * state; the previous version is never touched. Estimate any version
    * with `Sketch.hllEstimateFromRegs`. */
  def streamingHllSketch(stream: DataFrame, groupCols: Seq[String],
      hash: org.apache.spark.sql.Column, p: Int, path: String,
      keepVersions: Int = 3): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(keepVersions >= 2, "keepVersions must be >= 2 (replay safety)")
    import graft.operators.Sketch
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val batchSk = Sketch.hllSketch(batch, groupCols, hash, p)
        val merged = latestKmvVersion(spark, path, batchId) match {
          case Some(v) =>
            val prev = spark.read.parquet(s"$path/v$v")
            Sketch.hllMerge(prev.unionByName(batchSk), groupCols)
          case None => batchSk
        }
        merged.write.mode("overwrite").parquet(s"$path/v$batchId")
        val root = new org.apache.hadoop.fs.Path(path)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(root).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
          .flatMap(s => s.getPath.getName.drop(1).toLongOption.map((_, s.getPath)))
          .filter(_._1 <= batchId)
          .sortBy(-_._1).drop(keepVersions)
          .foreach { case (_, old) => fs.delete(old, true) }
      }
  }

  /** The current register state written by [[streamingHllSketch]]. */
  def readHllState(spark: SparkSession, path: String): DataFrame =
    latestKmvVersion(spark, path, Long.MaxValue) match {
      case Some(v) => spark.read.parquet(s"$path/v$v")
      case None => throw new IllegalStateException(s"no hll state under $path")
    }

  /** Streaming Bloom filter state: the membership twin of
    * [[streamingHllSketch]] — per micro-batch, pack the batch's keys
    * ([[graft.operators.Sketch.bloomBuild]]/`bloomPack`), word-wise-OR
    * merge into the latest strictly-older version, write v<batchId>.
    * Bit OR is idempotent, so the versioned-overwrite replay contract
    * carries over unchanged: a replayed batch re-ORs the same bits.
    * The continuously-maintained "have we ever seen this key" filter —
    * stream-side dedup screens and join pre-filters read the state
    * with [[readBloomState]] + `bloomMightContain`. */
  def streamingBloom(stream: DataFrame,
      hash: org.apache.spark.sql.Column, nHashes: Int, mBits: Int,
      path: String, keepVersions: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(keepVersions >= 2, "keepVersions must be >= 2 (replay safety)")
    import graft.operators.Sketch
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val batchPacked =
          Sketch.bloomPack(Sketch.bloomBuild(batch, hash, nHashes, mBits), mBits)
        val merged = latestKmvVersion(spark, path, batchId) match {
          case Some(v) =>
            val prev = spark.read.parquet(s"$path/v$v")
            Sketch.bloomMerge(prev.unionByName(batchPacked))
          case None => batchPacked
        }
        merged.write.mode("overwrite").parquet(s"$path/v$batchId")
        val root = new org.apache.hadoop.fs.Path(path)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(root).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
          .flatMap(s => s.getPath.getName.drop(1).toLongOption.map((_, s.getPath)))
          .filter(_._1 <= batchId)
          .sortBy(-_._1).drop(keepVersions)
          .foreach { case (_, old) => fs.delete(old, true) }
      }
  }

  /** The current packed words written by [[streamingBloom]]. */
  def readBloomState(spark: SparkSession, path: String): DataFrame =
    latestKmvVersion(spark, path, Long.MaxValue) match {
      case Some(v) => spark.read.parquet(s"$path/v$v")
      case None => throw new IllegalStateException(s"no bloom state under $path")
    }

  /** Freshness-weighted (bucketed exponential decay) counts per group:
    * each event contributes 2^−e of a count where e = floor(age /
    * halfLife) — the per-epoch half-life decay counters of trending /
    * recency-weighted sampling. The weight in ppb is the EXACT rounded
    * integer (10⁹ + 2^(e−1)) div 2^e, so the sums are layout-invariant
    * integers and the whole table replays externally — no exp()/pow()
    * anywhere. Ages are relative to the corpus max timestamp (one 1-row
    * aggregate, broadcast); e caps at 62 (weight 0 past ~2⁶² ages).
    * Returns (group…, n, w_ppb_sum, decayed) where decayed =
    * w_ppb_sum/10⁹ — the effective fresh-equivalent count. */
  def decayedCounts(events: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String], tsCol: org.apache.spark.sql.Column,
      halfLifeNs: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(halfLifeNs > 0, s"halfLifeNs must be positive, got $halfLifeNs")
    val tMax = events.agg(max(tsCol).as("_tmax"))
    val withAge = events.select(groupCols.map(col) :+ tsCol.as("_ts"): _*)
      .where(col("_ts").isNotNull)
      .crossJoin(broadcast(tMax))
      .withColumn("_e", least(
        expr(s"(_tmax - _ts) div ${halfLifeNs}L"), lit(62L)).cast("int"))
      // exact round-half-up of 1e9 / 2^e in pure integer ops
      .withColumn("_w_ppb", expr(
        "(1000000000L + shiftleft(1L, _e - 1) * cast(_e > 0 as long)) div shiftleft(1L, _e)"))
    withAge.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum("_w_ppb").as("w_ppb_sum"))
      .withColumn("decayed", col("w_ppb_sum").cast("double") / lit(1e9))
  }

  /** Streaming count-min sketch: per micro-batch, the batch's OWN
    * counters are written as a delta (d<batchId>) — counters are
    * additive (unlike the idempotent KMV-union / HLL-max merges), so
    * the versioned-overwrite design would double-count a replayed
    * batch; the delta design is idempotent because a replay overwrites
    * its own delta and never touches the others (the
    * [[streamingNearDupIngest]] artifact rule). Each delta is ≤
    * depth·width rows; [[readCmState]] sums them — compact by
    * rewriting the summed state as a fresh single delta when the count
    * grows. */
  def streamingCmSketch(stream: DataFrame, key: org.apache.spark.sql.Column,
      depth: Int, width: Int, path: String,
      seed: Long = 0L): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.Sketch
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sketch.cmSketch(batch, key, depth, width, seed)
          .write.mode("overwrite").parquet(s"$path/d$batchId")
      }
  }

  /** Streaming distribution monitor: per micro-batch, collapse the
    * streamed measure to its (value, count) histogram and write it as
    * delta `d<batchId>` — counts are ADDITIVE, so the per-batch-delta
    * design is the replay-idempotent one (a replayed batch overwrites
    * its OWN delta; the [[streamingCmSketch]] rule). The summed state
    * ([[readValueCounts]]) is the exact distribution of everything
    * seen; test it for drift against a frozen reference any time with
    * [[graft.operators.Evaluate.ksTest2Counts]] — bit-identical to a
    * one-shot [[graft.operators.Evaluate.ksTest2]] over the full
    * stream history, without revisiting it. State per batch is one row
    * per distinct value IN THAT BATCH (bucket/quantize the measure
    * upstream for unbounded-cardinality values — the q157 rule). */
  def streamingValueCounts(stream: DataFrame,
      value: org.apache.spark.sql.Column, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.select(value.cast("long").as("v"))
          .where(org.apache.spark.sql.functions.col("v").isNotNull)
          .groupBy("v")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("c"))
          .write.mode("overwrite").parquet(s"$path/d$batchId")
      }

  /** The summed (v, c) histogram of every completed
    * [[streamingValueCounts]] delta — the exact live distribution. */
  def readValueCounts(spark: SparkSession, path: String): DataFrame = {
    val deltas = completedDeltas(spark, path, Long.MaxValue)
    if (deltas.isEmpty)
      throw new IllegalStateException(s"no value-count state under $path")
    spark.read.parquet(deltas: _*)
      .groupBy("v")
      .agg(org.apache.spark.sql.functions.sum("c").as("c"))
  }

  /** The summed counter state of every completed [[streamingCmSketch]]
    * delta; estimate with [[graft.operators.Sketch.cmEstimate]]. */
  def readCmState(spark: SparkSession, path: String): DataFrame = {
    val deltas = completedDeltas(spark, path, Long.MaxValue)
    if (deltas.isEmpty)
      throw new IllegalStateException(s"no cm state under $path")
    spark.read.parquet(deltas: _*)
      .groupBy("row", "bucket")
      .agg(org.apache.spark.sql.functions.sum("cell").as("cell"))
  }

  /** Streaming co-moment accumulation — INCREMENTAL PCA statistics.
    * Each micro-batch reduces to ONE exact co-moment row (n, Σx, Σx·x
    * upper triangle — the `Pca.fit` sufficient statistics, all longs on
    * the quantization grid) written as delta `d<batchId>`. Co-moments
    * are ADDITIVE like the count-min counters, so the per-batch-delta
    * design is the replay-idempotent one (a replayed batch overwrites
    * its OWN delta; versioned-overwrite would double-count). Fit any
    * time with `Pca.fitFromSums(readCoMomentState(...))` — bit-identical
    * to a one-shot fit over everything seen, without revisiting
    * history. State is one row × (d + d(d+1)/2 + 1) longs per batch;
    * compact by rewriting the summed state as a fresh delta. */
  def streamingCoMoments(stream: DataFrame, vecCol: String, dims: Int,
      path: String, quant: Double = 10000.0)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.functions.{co_moments => coMoments}
    import graft.operators.Pca
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.select(coMoments(
            slice(Pca.quantize(col(vecCol), quant), 1, dims), dims).as("s"))
          .select(col("s.n").as("n"), col("s.sx").as("sx"),
            col("s.sxy").as("sxy"))
          .write.mode("overwrite").parquet(s"$path/d$batchId")
      }
  }

  /** Element-wise sum of every completed [[streamingCoMoments]] delta —
    * the (n, sx, sxy) row [[graft.operators.Pca.fitFromSums]] consumes. */
  def readCoMomentState(spark: SparkSession, path: String)
      : (Long, Array[Long], Array[Long]) = {
    val deltas = completedDeltas(spark, path, Long.MaxValue)
    if (deltas.isEmpty)
      throw new IllegalStateException(s"no co-moment state under $path")
    val df = spark.read.parquet(deltas: _*)
    val n = df.agg(sum("n")).head.getLong(0)
    def sumArr(name: String): Array[Long] = df
      .select(posexplode(col(name)).as(Seq("p", "v")))
      .groupBy("p").agg(sum("v").as("v"))
      .select(struct(col("p"), col("v")).as("z"))
      .agg(sort_array(collect_list(col("z"))).as("zs"))
      .select(transform(col("zs"), x => x.getField("v")).as("vs"))
      .head.getSeq[Long](0).toArray
    (n, sumArr("sx"), sumArr("sxy"))
  }

  /** Streaming incremental NEAR-dup ingest: each micro-batch is minhash-
    * signed, screened against the persisted corpus signature artifact
    * ([[graft.operators.Dedup.minhashAgainstSigs]] — banding +
    * signature-estimated jaccard, no raw corpus read), and the batch's
    * NOVEL docs' signatures are appended to the artifact so later
    * batches dedup against them too. The artifact is versioned like
    * [[streamingKmvSketch]]'s state (v<batchId> = previous version ∪
    * novel sigs; replayed batches re-derive from the strictly-older
    * version — idempotent, crash-safe). Novel doc rows are appended to
    * `path/docs` as plain parquet (idempotent per-batch overwrite of a
    * batch-keyed subdir). Ids must be globally unique across the
    * stream; docs with no shingles are unsignable and are dropped. */
  def streamingNearDupIngest(docStream: DataFrame, idCol: String,
      textCol: String, threshold: Double, path: String,
      numHashes: Int = 128, bands: Int = 32,
      seed: Long = 42L): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.Dedup
    docStream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val sigs = Dedup.minhashSignatures(batch, idCol, textCol,
          numHashes, seed = seed)
        // WITHIN-batch screening first: near-dups arriving together must
        // not both enter (survivors = ids with no smaller-id near-dup in
        // the batch — the usual greedy keep-smallest pair rule)
        val selfDup = Dedup.minhashAgainstSigs(sigs, sigs, threshold,
            numHashes, bands, seed)
          .where(col("a") > col("b")).select(col("a").as(idCol)).distinct()
        val screened = sigs.join(selfDup, Seq(idCol), "left_anti")
        // cross screening vs the union of all strictly-older DELTAS; each
        // batch persists ONLY its novel signatures (d<batchId>), so the
        // per-batch write is O(novel) and storage is linear in the corpus
        // — a replayed batch re-screens against the same older deltas and
        // overwrites its own delta: idempotent, no crash point loses state
        val prior = completedDeltas(spark, s"$path/sigs", batchId)
        val novel =
          if (prior.isEmpty) screened
          else {
            val corpus = spark.read.parquet(prior: _*)
            val dupIds = Dedup.minhashAgainstSigs(screened, corpus,
                threshold, numHashes, bands, seed)
              .select(col("a").as(idCol)).distinct()
            screened.join(dupIds, Seq(idCol), "left_anti")
          }
        novel.write.mode("overwrite").parquet(s"$path/sigs/d$batchId")
        val keptIds = spark.read.parquet(s"$path/sigs/d$batchId")
          .select(col(idCol))
        batch.join(keptIds, Seq(idCol))
          .write.mode("overwrite").parquet(s"$path/docs/b$batchId")
      }
  }

  /** Streaming topic tagging against a FROZEN φ artifact — the
    * continuous twin of [[graft.operators.Plsa.foldIn]] (q184's batch
    * path): per micro-batch, tokenize the incoming docs, run the
    * θ-only fold-in EM against the persisted topic-word table, and
    * write each batch's hard topic assignments to `b<batchId>`
    * (overwrite per batch → replay-idempotent, no cross-batch state —
    * the model is the state, and it never updates here). `phiPath` is
    * a parquet dump of a fitted `Plsa.Model.phi` (z, w, p). */
  def streamingTopicTag(docStream: DataFrame, idCol: String,
      textCol: String, phiPath: String, outPath: String,
      iters: Int = 2): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.Plsa
    docStream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val phi = spark.read.parquet(phiPath)
        val tok = batch.select(col(idCol).as("d"),
            explode(split(col(textCol), " ")).as("w"))
          .where(length(col("w")) > 0)
          .groupBy("d", "w").agg(count(lit(1)).as("c"))
        Plsa.docTopics(Plsa.foldIn(tok, "d", "w", "c", phi, iters))
          .withColumnRenamed("d", idCol)
          .write.mode("overwrite").parquet(s"$outPath/b$batchId")
      }
  }

  /** All complete (_SUCCESS-marked) signature delta dirs strictly below
    * `before`, via the Hadoop FS API. */
  private def completedDeltas(spark: SparkSession, dir: String,
      before: Long): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("d"))
      .flatMap(s => s.getPath.getName.drop(1).toLongOption.map(v => (v, s.getPath)))
      .filter { case (v, pth) => v < before &&
        fs.exists(new org.apache.hadoop.fs.Path(pth, "_SUCCESS")) }
      .sortBy(_._1).map(_._2.toString)
  }

  /** The current sketch state written by [[streamingKmvSketch]] (latest
    * committed version); estimate with `Sketch.kmvEstimateFromSketch`. */
  def readKmvState(spark: SparkSession, path: String): DataFrame =
    latestKmvVersion(spark, path, Long.MaxValue) match {
      case Some(v) => spark.read.parquet(s"$path/v$v")
      case None => throw new IllegalStateException(s"no kmv state under $path")
    }

  /** Highest complete (_SUCCESS-marked) state version strictly below
    * `before`, via the Hadoop FS API (cluster filesystems included). */
  private def latestKmvVersion(spark: SparkSession, path: String,
      before: Long): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .flatMap(s => s.getPath.getName.drop(1).toLongOption)
      .filter(v => v < before &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$path/v$v/_SUCCESS")))
      .maxOption
  }

  /** Streaming SPRT state — the batch [[graft.operators.Evaluate
    * .sprtBinary]] walk's online twin, because a sequential test IS a
    * streaming computation: each micro-batch reduces to ONE exact
    * (batch_id, n, n_pos) delta row (additive, replay-idempotent — a
    * replayed batch overwrites its OWN delta, the streamingValueCounts
    * design). The decision replays any time from the ≤#batches delta
    * table with [[readSprtDecision]]: the cumulative LLR walks the
    * batches in batch_id order, so crossings are detected at BATCH
    * granularity (within-batch arrival order is not meaningful in a
    * distributed stream — the documented, conservative semantic;
    * shrink the trigger interval for finer steps). */
  def streamingSprtCounts(stream: DataFrame,
      outcome: org.apache.spark.sql.Column, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // null-outcome rows drop, mirroring the batch sprtBinary (r8)
        batch.select(org.apache.spark.sql.functions.when(outcome, 1L)
            .when(!outcome, 0L).as("x"))
          .where(org.apache.spark.sql.functions.col("x").isNotNull)
          .agg(
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"),
            org.apache.spark.sql.functions.coalesce(
              org.apache.spark.sql.functions.sum("x"),
              org.apache.spark.sql.functions.lit(0L)).as("n_pos"))
          .withColumn("batch_id",
            org.apache.spark.sql.functions.lit(batchId))
          .write.mode("overwrite").parquet(s"$path/d$batchId")
      }

  /** Replay the batch-granular SPRT decision off
    * [[streamingSprtCounts]] state: same ppb-quantized increments and
    * boundaries as the batch operator, cumulative LLR over the
    * (bounded) batch table in batch_id order, first-crossing batch
    * reported. Returns one row: (n, n_pos, n_batches, inc1_ppb,
    * inc0_ppb, a_ppb, b_ppb, decision_batch, llr_at_decision,
    * llr_final, decision). */
  def readSprtDecision(spark: SparkSession, path: String, p0Ppm: Long,
      p1Ppm: Long, alphaPpm: Long, betaPpm: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    require(p0Ppm > 0L && p0Ppm < 1000000L && p1Ppm > 0L &&
      p1Ppm < 1000000L && p0Ppm != p1Ppm,
      s"p0/p1 must be distinct in (0, 1e6) ppm, got $p0Ppm, $p1Ppm")
    val inc1 = math.round(1e9 * math.log(p1Ppm.toDouble / p0Ppm))
    val inc0 = math.round(1e9 * math.log(
      (1000000L - p1Ppm).toDouble / (1000000L - p0Ppm)))
    val aPpb = math.round(1e9 * math.log(
      (1000000L - betaPpm).toDouble / alphaPpm))
    val bPpb = math.round(1e9 * math.log(
      betaPpm.toDouble / (1000000L - alphaPpm)))
    val deltas = completedDeltas(spark, path, Long.MaxValue)
    if (deltas.isEmpty)
      throw new IllegalStateException(s"no sprt state under $path")
    val w = org.apache.spark.sql.expressions.Window.orderBy("batch_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    // the window runs over the <= #batches delta table, never events
    val cum = spark.read.parquet(deltas: _*)
      .withColumn("cn", sum("n").over(w))
      .withColumn("c1", sum("n_pos").over(w))
      .withColumn("llr", col("c1") * inc1 + (col("cn") - col("c1")) * inc0)
    val crossed = col("llr") >= aPpb || col("llr") <= bPpb
    cum.agg(
        coalesce(max("cn"), lit(0L)).as("n"),
        coalesce(max("c1"), lit(0L)).as("n_pos"),
        count(lit(1)).as("n_batches"),
        min(when(crossed, col("batch_id"))).as("decision_batch"),
        min_by(col("llr"), when(crossed, col("batch_id")))
          .as("llr_at_decision"),
        max_by(col("llr"), col("batch_id")).as("llr_final"))
      .withColumn("inc1_ppb", lit(inc1))
      .withColumn("inc0_ppb", lit(inc0))
      .withColumn("a_ppb", lit(aPpb))
      .withColumn("b_ppb", lit(bPpb))
      .withColumn("decision",
        when(col("decision_batch").isNull, lit("continue"))
          .when(col("llr_at_decision") >= aPpb, lit("accept_h1"))
          .otherwise(lit("accept_h0")))
  }

  /** Streaming ingest for the [[graft.operators.Recommend.coCounts]]
    * recommender model — co-counts are ADDITIVE across user-disjoint
    * batches (the documented contract there), which is exactly the
    * per-batch-delta shape: each micro-batch reduces to its own
    * coCounts frame written as delta `d<batchId>` (a replayed batch
    * overwrites its OWN delta — the streamingValueCounts /
    * streamingCoMoments idempotence design), and the live model is
    * the sum-merge of every committed delta. Serve any time with
    * `Recommend.itemItemRecsFromCounts(readCoCounts(...), ...)`. */
  def streamingCoCounts(stream: DataFrame, userCol: String,
      itemCol: String, path: String, maxUserItems: Int = 1000)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Recommend
          .coCounts(batch, userCol, itemCol, maxUserItems)
          .write.mode("overwrite").parquet(s"$path/d$batchId")
      }

  /** The sum-merged co-count model of every completed
    * [[streamingCoCounts]] delta — equals the one-shot
    * [[graft.operators.Recommend.coCounts]] over the full history
    * EXACTLY when batches were user-disjoint. */
  def readCoCounts(spark: SparkSession, path: String): DataFrame = {
    val deltas = completedDeltas(spark, path, Long.MaxValue)
    if (deltas.isEmpty)
      throw new IllegalStateException(s"no co-count state under $path")
    spark.read.parquet(deltas: _*)
      .groupBy("a", "b")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
  }
}
