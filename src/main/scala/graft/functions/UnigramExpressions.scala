package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** unigram_segment(word) → struct(cost_micro, pieces): the minimum-cost
  * segmentation of one word under a unigram piece model (Kudo 2018, the
  * SentencePiece unigram algorithm's Viterbi decode), in EXACT integer
  * min-plus arithmetic: each vocab piece carries a fixed-point cost in
  * micro-nats (round(−ln p · 1e6), quantized ONCE at train time), so
  * the DP over cost sums is pure integer work with an engine-portable
  * tie rule — on equal total cost the EARLIER split point wins (the
  * longest final piece), making the argmin unique and layout-stable.
  *
  * Characters absent from the vocab fall back to `unkCostMicro`
  * single-char pieces (full coverage — a word never fails to segment).
  * The vocab rides in the expression (plan-serialized, one table per
  * executor) — zero shuffle, zero UDF; [[WordPieceEncode]]'s pattern,
  * upgraded from greedy longest-match to the global optimum.
  *
  * reference: docarray has no subword tokenizer; this extends the
  * training-data tier (BPE `BpeEncode`, WordPiece `WordPieceEncode`)
  * with the third major algorithm family. */
case class UnigramSegment(child: Expression,
    vocab: Seq[(String, Long)], unkCostMicro: Long = 50000000L)
    extends UnaryExpression {
  require(vocab.nonEmpty, "unigram_segment needs a non-empty vocab")
  require(unkCostMicro > 0L, s"unkCostMicro must be > 0, got $unkCostMicro")

  @transient private lazy val costs: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    vocab.foreach { case (p, c) =>
      require(p.nonEmpty, "empty vocab piece")
      require(c >= 0L, s"negative piece cost for '$p'")
      require(!m.containsKey(p), s"duplicate vocab piece '$p'")
      m.put(p, java.lang.Long.valueOf(c))
    }
    m
  }
  @transient private lazy val maxPiece: Int = vocab.map(_._1.length).max

  override def dataType: DataType = StructType(Seq(
    StructField("cost_micro", LongType, nullable = false),
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment expects string, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    kernel(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("usExpr", this,
      classOf[UnigramSegment].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  /** Public for the generated code (r8: plan-reference call keeps the
    * 20M-token encode scan inside whole-stage codegen). */
  def kernel(v: UTF8String): InternalRow = {
    val w = v.toString
    val n = w.length
    if (n == 0)
      return InternalRow(0L, new GenericArrayData(Array.empty[Any]))
    // best(i) = min cost of segmenting w[0, i); ties -> smallest j
    // (earliest split = longest final piece)
    val best = Array.fill(n + 1)(Long.MaxValue)
    val bp = Array.fill(n + 1)(-1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPiece)
      while (j < i) {
        if (best(j) != Long.MaxValue) {
          val piece = w.substring(j, i)
          val pc = costs.get(piece)
          val c =
            if (pc != null) pc.longValue()
            else if (i - j == 1) unkCostMicro
            else -1L
          if (c >= 0L) {
            val total = best(j) + c
            // strict <: on ties the FIRST (smallest) j wins
            if (total < best(i)) { best(i) = total; bp(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    val out = new java.util.ArrayList[UTF8String]()
    var pos = n
    while (pos > 0) {
      val j = bp(pos)
      out.add(0, UTF8String.fromString(w.substring(j, pos)))
      pos = j
    }
    InternalRow(best(n),
      new GenericArrayData(out.toArray(Array.empty[AnyRef])))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "unigram_segment"
}
