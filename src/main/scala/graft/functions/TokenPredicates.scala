package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Early-exit token-count kernels behind [[HasMinTokens]].
  *
  * Why this exists (optimization round 10, guide §4.4): every
  * `select(expensive_text_kernel(text)).where(predicate_on_result)`
  * shape in the dedup/LM operators had its predicate pushed below the
  * projection by Catalyst, which re-substitutes the alias — so the
  * expensive kernel (minhash_text at 128 hashes/shingle, tokenize+split)
  * ran TWICE per row: once inside the pushed Filter, once in the
  * Project. Filtering instead on a cheap, exactly-equivalent "has at
  * least n tokens" predicate of the raw text makes the pushed filter
  * nearly free and leaves exactly one evaluation of the real kernel.
  *
  * Two flavors, because the repo has two tokenizer definitions:
  *  - `ascii = true`: the byte-walk tokenizer of [[HashKernels.minhashText]]
  *    / [[HashKernels.textNgrams]] (tokens = maximal runs of `[a-z0-9]`
  *    after ASCII-only A-Z folding; every non-ASCII byte is a separator).
  *    `hasMinTokens(s, n, true)` ⟺ that kernel finds ≥ n tokens ⟺
  *    minhash_text's signature is non-sentinel at ngram ≤ n, and
  *    text_ngrams(s, n) is non-empty.
  *  - `ascii = false`: [[TextFunctions.tokens]] semantics
  *    (`filter(split(lower(text), "[^a-z0-9]+"), _ != "")`). For pure
  *    ASCII input the byte walk is exact; any non-ASCII byte falls back
  *    to `UTF8String.toLowerCase` (the same call the `lower` expression
  *    makes) and counts `[a-z0-9]` runs in the lowered bytes — exact,
  *    because the regex splits on codepoints outside `[a-z0-9]` and
  *    ASCII bytes in UTF-8 only ever encode ASCII codepoints.
  */
object TokenKernels {
  /** ≥ n tokens under the byte-walk tokenizer; early exit at the n-th
    * token start (O(prefix), not O(doc)). */
  private def countsAtLeastBytes(bytes: Array[Byte], n: Int,
      foldAZ: Boolean): Boolean = {
    var found = 0
    var inTok = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val isTok =
        (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
          (foldAZ && b >= 'A' && b <= 'Z')
      if (isTok && !inTok) {
        found += 1
        if (found >= n) return true
        inTok = true
      } else if (!isTok && inTok) inTok = false
      i += 1
    }
    found >= n
  }

  def hasMinTokens(s: UTF8String, n: Int, ascii: Boolean): Boolean = {
    if (n <= 0) return true
    val bytes = s.getBytes
    if (ascii) return countsAtLeastBytes(bytes, n, foldAZ = true)
    var allAscii = true
    var i = 0
    while (i < bytes.length && allAscii) {
      if (bytes(i) < 0) allAscii = false
      i += 1
    }
    if (allAscii) countsAtLeastBytes(bytes, n, foldAZ = true)
    else countsAtLeastBytes(s.toLowerCase.getBytes, n, foldAZ = true)
  }
}

/** has_min_tokens(text, n[, ascii]) → boolean: does `text` tokenize to
  * at least `n` tokens? Exactly equivalent to (and a cheap stand-in
  * for) `size(TextFunctions.tokens(text)) >= n` (`ascii = false`) or
  * the non-sentinel test of the fused byte-walk kernels
  * (`ascii = true`). See [[TokenKernels]]. */
case class HasMinTokens(child: Expression, n: Int, ascii: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"has_min_tokens needs n >= 1, got $n")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "has_min_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects string, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TokenKernels.hasMinTokens(v.asInstanceOf[UTF8String], n, ascii)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenKernels.hasMinTokens($c, $n, $ascii);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
