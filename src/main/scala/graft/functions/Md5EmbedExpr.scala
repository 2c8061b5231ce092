package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native deterministic stub embedding — the codegen replacement for
  * [[graft.Embeddings.embedColHof]]'s higher-order-function form
  * (`transform(sequence(0, dim-1), i -> …md5(i ∥ ":" ∥ text)…)`).
  *
  * The HOF form runs interpreted: every row dispatches `dim` lambda
  * invocations, each re-serializing the FULL sentence into a fresh
  * concat buffer before hashing, plus per-element Decimal/conv string
  * round-trips — measured as the dominant cost of the campaign-index
  * build (~4 s of a 6 s query at sf0.1 for 10k sentences × 64 dims).
  * This expression does the same arithmetic in one flat loop per row
  * via a static helper: the text bytes serialize ONCE, the digest
  * object is thread-local, and the hex/conv/pmod dance collapses to
  * unsigned-int arithmetic on the digest's first 4 bytes — so the
  * embed pass stays inside whole-stage codegen with ~zero allocation
  * beyond the output array.
  *
  * Bit-identical to the HOF twin (spec-checked equal) and to the
  * DuckDB oracle twin (`embSql`): element i =
  * `(float)((conv(substr(md5(i ∥ ":" ∥ text), 1, 8), 16, 10) % 1000)
  * / 500.0 − 1.0)` — the first 8 hex chars are exactly the digest's
  * first 4 bytes as an unsigned 32-bit big-endian integer, and the
  * %-/-− chain runs the same IEEE double ops before the float cast.
  * Null text yields a null array (the usual expression null
  * propagation); callers embed coalesced sentences, never nulls. */
case class Md5Embed(child: Expression, dim: Int) extends UnaryExpression {
  require(dim > 0, s"md5_embed dim must be positive, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_embed expects string, got ${other.simpleString}")
  }

  // containsNull = true matches the HOF twin's schema (its lambda is
  // nullable), so swapping the implementations never changes a written
  // parquet schema
  override def dataType: DataType = ArrayType(FloatType, containsNull = true)

  override def prettyName: String = "md5_embed"

  override protected def nullSafeEval(input: Any): Any =
    Md5EmbedUtil.embed(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5EmbedUtil.embed($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helpers shared by [[Md5Embed]]'s interpreted and generated
  * paths (Scala objects expose static forwarders for Janino). */
object Md5EmbedUtil {
  private val mdLocal: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest =
        MessageDigest.getInstance("MD5")
    }

  /** `"0:".getBytes … "(dim-1):".getBytes`, cached per dim — the loop
    * prefixes are the same for every row. */
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def prefixes(dim: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(dim,
      d => Array.tabulate(d)(i => s"$i:".getBytes("UTF-8")))

  def embed(text: UTF8String, dim: Int): ArrayData = {
    val md = mdLocal.get()
    val textBytes = text.getBytes // serialized ONCE per row
    val pre = prefixes(dim)
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      md.reset()
      md.update(pre(i))
      md.update(textBytes)
      val d = md.digest()
      // first 8 hex chars == first 4 bytes as unsigned 32-bit big-endian
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      out(i) = ((v % 1000L).toDouble / 500.0 - 1.0).toFloat
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
