package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Checksum-validated PII detection: payment-card numbers. A bare
  * `[0-9]{13,19}` regex over web text redacts order ids, timestamps and
  * phone numbers wholesale; the Luhn check (ISO/IEC 7812 mod-10) cuts
  * the false-positive rate ~10× because only 1-in-10 random digit runs
  * pass. Semantics (fixed, oracle-replayable):
  *
  *  - a candidate is a MAXIMAL run of ASCII digits of length 13–19
  *    (a 20-digit run is NOT a candidate — no sub-run matching);
  *  - a candidate is redacted iff its Luhn checksum is 0: from the
  *    rightmost digit leftwards, double every second digit, subtract 9
  *    from products > 9, sum mod 10 == 0;
  *  - redaction replaces the whole run with the literal `[CARD]`.
  *
  * Both expressions are one pass over the UTF-8 bytes (multi-byte code
  * points can never be ASCII digits, so byte scanning is exact), map-only
  * and shuffle-free — the 100 TB shape for a scrubbing pass.
  */
object Luhn {
  /** Luhn checksum of bytes[from, until) (ASCII digits) — 0 means valid. */
  private[functions] def checksum(bytes: Array[Byte], from: Int,
      until: Int): Int = {
    var sum = 0
    var i = until - 1
    var second = false
    while (i >= from) {
      var d = bytes(i) - '0'
      if (second) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      second = !second
      i -= 1
    }
    sum % 10
  }

  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** Walk maximal digit runs; cb(start, end) for each 13–19-length run. */
  private[functions] def eachCandidate(bytes: Array[Byte])(
      cb: (Int, Int) => Unit): Unit = {
    var i = 0
    val n = bytes.length
    while (i < n) {
      if (isDigit(bytes(i))) {
        var j = i + 1
        while (j < n && isDigit(bytes(j))) j += 1
        if (j - i >= 13 && j - i <= 19) cb(i, j)
        i = j
      } else i += 1
    }
  }
}

/** redact_cards(text) → string: every maximal 13–19-digit run passing
  * Luhn replaced by `[CARD]`. */
case class RedactCards(child: Expression) extends UnaryExpression {
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
    val ref = ctx.addReferenceObj("rcExpr", this,
      classOf[RedactCards].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  /** Public for the generated code (r8 plan-reference call). */
  def kernel(v: UTF8String): UTF8String = {
    val bytes = v.getBytes
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var last = 0
    Luhn.eachCandidate(bytes) { (s, e) =>
      if (Luhn.checksum(bytes, s, e) == 0) {
        out.write(bytes, last, s - last)
        out.write("[CARD]".getBytes("US-ASCII"))
        last = e
      }
    }
    if (last == 0) v
    else {
      out.write(bytes, last, bytes.length - last)
      UTF8String.fromBytes(out.toByteArray)
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "redact_cards"
}

/** card_run_stats(text) → struct<n_runs:int, n_valid:int>: candidate
  * 13–19-digit runs and how many pass Luhn (the audit columns for a
  * scrubbing report). */
case class CardRunStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_runs", IntegerType, nullable = false),
    StructField("n_valid", IntegerType, nullable = false)))
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
    val ref = ctx.addReferenceObj("crsExpr", this,
      classOf[CardRunStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  /** Public for the generated code (r8 plan-reference call). */
  def kernel(v: UTF8String): InternalRow = {
    val bytes = v.getBytes
    var runs = 0
    var valid = 0
    Luhn.eachCandidate(bytes) { (s, e) =>
      runs += 1
      if (Luhn.checksum(bytes, s, e) == 0) valid += 1
    }
    InternalRow(runs, valid)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "card_run_stats"
}
