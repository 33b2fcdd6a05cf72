package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

import graft.functions._
import graft.functions.TextFunctions

/** UDF / batch-UDF surface: `map`, `apply`, `map_batch`, `embed`
  * (reference: docarray/array/mixins/parallel.py:56-251,
  * docarray/array/mixins/embed.py:17-208).
  *
  * The reference's thread/process pools are exactly Spark's executor
  * parallelism; `map_batch` is `mapPartitions` with bounded batches; the
  * `embed` batched-DNN-inference pattern is `mapPartitions` with a
  * broadcast model handle (the standard predict_batch shape — plug ONNX
  * Runtime or any JVM model here; none ships in this container).
  */
object Parallel {

  /** map(func): per-row typed transform (reference parallel.py:56-99). */
  def mapDocs[T, U: Encoder](ds: Dataset[T], f: T => U): Dataset[U] = ds.map(f)

  /** map_batch(func, batch_size): per-batch transform
    * (reference parallel.py:117-251). Batches never cross partitions. */
  def mapBatch[T, U: Encoder](ds: Dataset[T], batchSize: Int)(
      f: Seq[T] => Iterator[U]): Dataset[U] =
    ds.mapPartitions(_.grouped(batchSize).flatMap(f))

  /** embed: batched model inference filling an embedding column
    * (reference embed.py:17-208). `model` must be a serializable
    * batch-scoring function — broadcast once per executor, and it must
    * return exactly one embedding per input row: a short return would
    * otherwise silently drop rows, and a mid-batch omission would
    * shift every later (row, embedding) pair — enforced per batch. */
  def embed[T: Encoder](ds: Dataset[T], batchSize: Int)(
      model: Seq[T] => Seq[Array[Float]])(implicit
      enc: Encoder[(T, Array[Float])]): Dataset[(T, Array[Float])] =
    ds.mapPartitions(_.grouped(batchSize).flatMap { b =>
      val out = model(b)
      require(out.size == b.size,
        s"embed model returned ${out.size} embeddings for ${b.size} rows" +
          " — return one per row (null/empty for failures), never skip")
      b.zip(out)
    })

  /** embed_feature_hashing: the built-in dependency-free embedder
    * (reference: document/mixins/featurehash.py:14-54) — hashing trick
    * over the token set, as a pure codegen-free Catalyst expression. */
  def embedFeatureHashing(df: DataFrame, textCol: String,
      nDim: Int = 256, outCol: String = "embedding"): DataFrame =
    df.withColumn(outCol, feature_hash(TextFunctions.tokens(col(textCol)), nDim))

  /** convert_text_to_tensor: vocab-index encode with left-pad/truncate,
    * 0 = pad, 1 = unk (reference: document/mixins/text.py:15-66). The
    * vocab map is broadcast via the closure. */
  def textToTensor(df: DataFrame, textCol: String, vocab: Map[String, Int],
      maxLength: Int, outCol: String = "tensor_ids"): DataFrame = {
    val enc = udf { (text: String) =>
      if (text == null) null
      else {
        val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        val ids = toks.map(t => vocab.getOrElse(t, 1) + 1)
        val cut = ids.takeRight(maxLength)
        Array.fill(maxLength - cut.length)(0) ++ cut
      }
    }
    df.withColumn(outCol, enc(col(textCol)))
  }

  /** Scale path for convert_text_to_tensor: the vocabulary stays a
    * DataFrame end-to-end — no driver-side collect, no closure-shipped
    * Map. Ranks the (word, n) vocab by (freq desc, word) via
    * [[GroupOps.rankVocabulary]], posexplodes tokens, equi-joins token→id
    * (broadcast when `broadcastVocab`; pass false once the vocab outgrows
    * the broadcast threshold and let it shuffle-join), then reassembles
    * per-doc id sequences by position: keep the last `maxLength`, left-pad
    * zeros. Identical output to [[textToTensor]] with the vocab map
    * `word -> rank + 2` (asserted in ParallelSpec). */
  def textToTensorJoin(df: DataFrame, textCol: String, vocab: DataFrame,
      maxLength: Int, idCol: String = "doc_id", outCol: String = "tensor_ids",
      broadcastVocab: Boolean = true): DataFrame = {
    val ranked0 = GroupOps.rankVocabulary(vocab)
    val ranked = if (broadcastVocab) broadcast(ranked0) else ranked0
    val toks = df.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("_pos", "_w")))
    val enc = toks.join(ranked, toks("_w") === ranked("word"), "left")
      .select(col(idCol), col("_pos"),
        (coalesce(col("vid"), lit(1)) + 1).cast("int").as("_tid"))
      .groupBy(idCol)
      // comparator sorts on _pos alone (struct here is orderable, but the
      // explicit comparator keeps this safe for arbitrary payload types)
      .agg(transform(
        array_sort(collect_list(struct(col("_pos"), col("_tid"))),
          (l, r) => when(l("_pos") < r("_pos"), -1)
            .when(l("_pos") > r("_pos"), 1).otherwise(0)),
        e => e.getField("_tid")).as("_ids"))
    val ids = coalesce(col("_ids"), lit(Array.empty[Int]))
    df.join(enc, Seq(idCol), "left")
      .withColumn(outCol,
        when(col(textCol).isNull, lit(null))
          .otherwise(concat(
            array_repeat(lit(0), greatest(lit(0), lit(maxLength) - size(ids))),
            slice(ids, greatest(lit(1), size(ids) - maxLength + 1), lit(maxLength)))))
      .drop("_ids")
  }

  /** convert_tensor_to_text inverse (reference text.py:68-88). */
  def tensorToText(df: DataFrame, idsCol: String, vocab: Map[String, Int],
      outCol: String = "text_decoded"): DataFrame = {
    val inv = vocab.map { case (w, i) => (i + 1) -> w }
    val dec = udf { (ids: Seq[Int]) =>
      if (ids == null) null
      else ids.filter(_ > 1).flatMap(inv.get).mkString(" ")
    }
    df.withColumn(outCol, dec(col(idsCol)))
  }

  /** Scale path for convert_tensor_to_text: inverse of
    * [[textToTensorJoin]] with the vocabulary kept as a DataFrame.
    * Token id = rank-vid + 1, so the inner equi-join drops pad (0) and
    * unk ids for free, exactly like the legacy closure path's
    * `flatMap(inv.get)`. */
  def tensorToTextJoin(df: DataFrame, idsCol: String, vocab: DataFrame,
      idCol: String = "doc_id", outCol: String = "text_decoded",
      broadcastVocab: Boolean = true): DataFrame = {
    val ranked0 = GroupOps.rankVocabulary(vocab)
    val ranked = if (broadcastVocab) broadcast(ranked0) else ranked0
    val toks = df.select(col(idCol),
      posexplode(col(idsCol)).as(Seq("_pos", "_tid")))
    val dec = toks.join(ranked, toks("_tid") === ranked("vid") + 1)
      .groupBy(idCol)
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("_pos"), col("word"))),
          (l, r) => when(l("_pos") < r("_pos"), -1)
            .when(l("_pos") > r("_pos"), 1).otherwise(0)),
        e => e.getField("word"))).as("_txt"))
    df.join(dec, Seq(idCol), "left")
      .withColumn(outCol,
        when(col(idsCol).isNull, lit(null))
          .otherwise(coalesce(col("_txt"), lit(""))))
      .drop("_txt")
  }
}
