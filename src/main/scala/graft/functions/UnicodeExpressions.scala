package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization expressions for corpus normalization — the
  * normalize-before-anything step of a web-scale text pipeline (the same
  * text byte-differs as NFC vs NFD, so exact dedup / line dedup / shingle
  * hashing all require a canonical form first).
  *
  * Reference counterpart: the reference normalizes text implicitly through
  * Python's str (always NFC-agnostic but stable); a Spark pipeline over
  * crawled bytes must do it explicitly. Kept as scalar expressions so they
  * ride inside the scan projection.
  */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression {
  private val nf = Normalizer.Form.valueOf(form.toUpperCase)
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects string, got ${t.sql}")
  }
  /** Public for the generated code (r8 plan-reference call). */
  def kernel(v: UTF8String): UTF8String = {
    val s = v.toString
    // fast path: Normalizer.isNormalized is a cheap scan, ASCII never allocates
    if (Normalizer.isNormalized(s, nf)) v
    else UTF8String.fromString(Normalizer.normalize(s, nf))
  }
  override def nullSafeEval(v: Any): Any =
    kernel(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("ntExpr", this,
      classOf[NormalizeText].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "normalize_text"
}

/** NFD-decompose, drop combining marks (Mn/Mc/Me), NFC-recompose — the
  * utf8proc `strip_accents` semantics (DuckDB/ClickHouse): 'é' → 'e' but
  * 'ø'/'æ'/'ß' (no canonical decomposition) pass through unchanged. */
case class StripAccents(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects string, got ${t.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    kernel(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("saExpr", this,
      classOf[StripAccents].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  /** Public for the generated code (r8 plan-reference call). */
  def kernel(v: UTF8String): UTF8String = {
    val s = v.toString
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    val out = Normalizer.normalize(sb, Normalizer.Form.NFC)
    if (out == s) v else UTF8String.fromString(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "strip_accents"
}
