package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE encode as a scalar expression: pre-tokenize with the GPT-2-style
  * pattern ([[TextFunctions.bpePattern]], which tiles the input), then
  * apply the trained merges greedily — always the LOWEST-rank applicable
  * merge first, the standard BPE inference rule. The merge table rides in
  * the expression (serialized with the plan, one rank map per executor) —
  * zero shuffle, zero UDF. */
private[graft] object BpeApply {
  // keyed on the pair itself: any joined-string key is ambiguous when a
  // symbol can contain the separator (space-run symbols contain spaces,
  // the fallback token class can contain any character), and the old raw
  // NUL separator also made this file binary to git
  def ranks(merges: Seq[(String, String)]): java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put((a, b), i) }
    m
  }

  val pattern: Pattern = Pattern.compile(TextFunctions.bpePattern)

  /** Seed symbols by CODE POINT, not UTF-16 unit: per-char seeding splits
    * astral characters into lone surrogates that mangle to '?' on UTF-8
    * encode, and disagrees with the code-point `substr` semantics of the
    * SQL twin [[graft.operators.Bpe.pairCounts]]. */
  def codePointSymbols(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      val n = Character.charCount(s.codePointAt(i))
      out += s.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Greedy merge of one pre-token piece. */
  def applyPiece(piece: String, ranks: java.util.HashMap[(String, String), Integer],
      out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    if (piece.isEmpty) return
    var syms = scala.collection.mutable.ArrayBuffer.from(codePointSymbols(piece))
    var done = false
    while (!done && syms.length > 1) {
      // find the lowest-rank adjacent pair
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get((syms(i), syms(i + 1)))
        if (r != null && r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        // merge every occurrence of that pair left-to-right
        val a = syms(bestAt); val b = syms(bestAt + 1); val ab = a + b
        val next = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            next += ab; j += 2
          } else { next += syms(j); j += 1 }
        }
        syms = next
      }
    }
    out ++= syms
  }

  def encode(text: String, ranks: java.util.HashMap[(String, String), Integer]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val m = pattern.matcher(text)
    while (m.find()) applyPiece(m.group(), ranks, out)
    out.toSeq
  }
}

case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  @transient private lazy val ranks = BpeApply.ranks(merges)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects string, got ${t.sql}")
  }
  /** Public for the generated code (r8: plan-reference call keeps the
    * 1M-row encode scan inside whole-stage codegen). */
  def kernel(v: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new GenericArrayData(BpeApply.encode(v.toString, ranks)
      .map(s => UTF8String.fromString(s)).toArray[Any])
  override def nullSafeEval(v: Any): Any =
    kernel(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeExpr", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "bpe_encode"
}

/** Token ids in the given vocabulary (−1 = symbol not in vocab). */
/** WordPiece greedy longest-match-first encode (the BERT inference
  * tokenizer, Devlin et al. 2018 / the original Schuster & Nakajima
  * scheme) over an ALREADY word-split `array<string>` input: per word,
  * repeatedly take the longest vocab piece matching at the cursor
  * (continuation pieces carry the `##` prefix); if any position has no
  * match — or the word exceeds `maxWordLen` — the WHOLE word collapses
  * to `unk` (the BERT rule, not partial emission). The vocab rides in
  * the expression (plan-serialized, one set per executor) — zero
  * shuffle, zero UDF; [[BpeEncode]]'s merge-table pattern. */
case class WordPieceEncode(child: Expression, vocab: Seq[String],
    unk: String = "[UNK]", maxWordLen: Int = 100)
    extends UnaryExpression {
  require(vocab.nonEmpty, "wordpiece needs a non-empty vocab")
  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(s.add)
    s
  }
  @transient private lazy val maxPiece: Int =
    vocab.map(p => if (p.startsWith("##")) p.length - 2 else p.length).max
  override def dataType: DataType = ArrayType(StringType)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode expects array<string>, got ${t.sql}")
  }
  private def encodeWord(w: String, out: java.util.ArrayList[UTF8String]): Unit = {
    if (w.isEmpty) return
    if (w.length > maxWordLen) { out.add(UTF8String.fromString(unk)); return }
    val pieces = new java.util.ArrayList[UTF8String]()
    var pos = 0
    while (pos < w.length) {
      var len = math.min(maxPiece, w.length - pos)
      var hit = -1
      while (len >= 1 && hit < 0) {
        val cand =
          if (pos == 0) w.substring(0, len)
          else "##" + w.substring(pos, pos + len)
        if (vocabSet.contains(cand)) hit = len else len -= 1
      }
      if (hit < 0) { out.add(UTF8String.fromString(unk)); return }
      pieces.add(UTF8String.fromString(
        if (pos == 0) w.substring(0, hit) else "##" + w.substring(pos, pos + hit)))
      pos += hit
    }
    out.addAll(pieces)
  }
  /** Public for the generated code (r8 plan-reference call). */
  def kernel(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) encodeWord(arr.getUTF8String(i).toString, out)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override def nullSafeEval(v: Any): Any =
    kernel(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("wpExpr", this,
      classOf[WordPieceEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "wordpiece_encode"
}

case class BpeEncodeIds(child: Expression, merges: Seq[(String, String)],
    vocab: Seq[String])
    extends UnaryExpression {
  @transient private lazy val ranks = BpeApply.ranks(merges)
  @transient private lazy val ids = {
    val m = new java.util.HashMap[String, Integer]()
    vocab.zipWithIndex.foreach { case (s, i) => m.put(s, i) }
    m
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects string, got ${t.sql}")
  }
  /** Public for the generated code (r8 plan-reference call). */
  def kernel(v: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = BpeApply.encode(v.toString, ranks)
    new GenericArrayData(toks.map { t =>
      val i = ids.get(t); if (i == null) -1 else i.intValue()
    }.toArray[Any])
  }
  override def nullSafeEval(v: Any): Any =
    kernel(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeIdsExpr", this,
      classOf[BpeEncodeIds].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "bpe_encode_ids"
}
