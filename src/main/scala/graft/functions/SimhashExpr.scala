package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 60-bit SimHash over a token array — the codegen replacement for
  * the higher-order-function form ([[graft.operators.Dedup.simhashHof]]).
  *
  * The HOF form (`aggregate` + `zip_with` + `transform` over 60-element
  * arrays per token) runs interpreted: every token invokes nested lambdas
  * and allocates two 60-element arrays (measured ~1.8 s for 5 000 docs at
  * sf0.1 — a constant factor that follows the operator to 100 TB). This
  * expression does the same arithmetic in one flat loop per row via a
  * static helper call, so the scan stays inside whole-stage codegen with
  * zero per-token allocation.
  *
  * Bit-identical to the HOF form and to the DuckDB oracle: per-token hash
  * = first 15 hex chars of md5 (= the md5 digest's 60-bit big-endian
  * prefix), ±1 vote per bit, sign → bit (strictly-positive counts set the
  * bit, ties clear it).
  */
case class Simhash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimhashUtil.simhash60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashUtil.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helpers shared by [[Simhash60]]'s interpreted and generated
  * paths (Scala objects expose static forwarders, so Janino-generated code
  * can call these directly). */
object SimhashUtil {
  private val mdLocal: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest =
        MessageDigest.getInstance("MD5")
    }

  /** The md5 digest's 60-bit big-endian prefix — numerically equal to
    * `conv(substring(md5(s), 1, 15), 16, 10)` (7 full bytes + the high
    * nibble of byte 7), i.e. [[graft.operators.Dedup.shingleHash]]. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  def simhash60(tokens: ArrayData): Long = {
    val counts = new Array[Int](60)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash60(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 60) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (counts(b) > 0) out |= 1L << b; b += 1 }
    out
  }
}
