package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native rolling polynomial fingerprint over a token array — the codegen
  * twin of [[graft.operators.TextAnalysis.fingerprintHof]]
  * (`h ← (h·131 + len(w)·31 + ascii(w)) mod 1 000 000 007`, order-
  * sensitive). Same flat-loop/static-helper shape as [[Simhash60]]: the
  * HOF `aggregate` form runs interpreted per token; this stays inside
  * whole-stage codegen.
  *
  * Per-token terms replicate the built-ins exactly: `length` = character
  * count (`UTF8String.numChars`), `ascii` = the first character's CODE
  * POINT (measured: Spark 4's `ascii('한글')` = 54620) — decoded straight
  * from the UTF-8 bytes, no per-token String allocation; spec-pinned
  * against the HOF twin on Korean rows.
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fingerprint64 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "fingerprint64"

  override protected def nullSafeEval(input: Any): Any =
    FingerprintUtil.fingerprint(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FingerprintUtil.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FingerprintUtil {
  /** First UTF-8 codepoint of the byte sequence (0 when empty) — the value
    * Spark's `ascii` returns for the first character. */
  def firstCodePoint(bytes: Array[Byte]): Int = {
    if (bytes.length == 0) return 0
    val b0 = bytes(0) & 0xff
    if (b0 < 0x80) b0
    else if ((b0 & 0xe0) == 0xc0)
      ((b0 & 0x1f) << 6) | (bytes(1) & 0x3f)
    else if ((b0 & 0xf0) == 0xe0)
      ((b0 & 0x0f) << 12) | ((bytes(1) & 0x3f) << 6) | (bytes(2) & 0x3f)
    else
      ((b0 & 0x07) << 18) | ((bytes(1) & 0x3f) << 12) |
        ((bytes(2) & 0x3f) << 6) | (bytes(3) & 0x3f)
  }

  def fingerprint(tokens: ArrayData): Long = {
    var h = 0L
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val ascii = firstCodePoint(s.getBytes)
        h = (h * 131L + s.numChars().toLong * 31L + ascii) % 1000000007L
      }
      i += 1
    }
    h
  }
}
