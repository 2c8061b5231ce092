package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, FloatType}

/** Native product-quantization encoder — the codegen replacement for the
  * higher-order-function form ([[graft.operators.Ann.pqEncodeHof]]).
  *
  * The HOF form (`transform` over subspaces × `aggregate` over codes ×
  * `zip_with` over dims) runs interpreted: every row invokes m·ksub
  * nested lambdas and allocates a dsub-element array per candidate code —
  * the same constant factor the repo already measured on the minhash HOFs
  * (~100× vs codegen at sf0.1). This expression does the identical
  * arithmetic in one flat loop via a static helper, so the encode scan
  * stays inside whole-stage codegen with zero per-code allocation. Float
  * semantics match the HOF bit-for-bit: the per-dim squared difference is
  * computed in FLOAT, then widened to double for the sum; strict `<`
  * keeps the first (smallest) code on ties.
  *
  * The codebook rides along as a flat `float[]` reference object
  * (`cb[(j·ksub + c)·dsub + i]`) — m·ksub·dsub floats, the same bounded
  * footprint the HOF's literal carried. The element COUNT is checked
  * (must be exactly m·dsub); null array ELEMENTS are the caller's
  * precondition (embeddings are non-null by schema) — the HOF twin
  * null-propagates where this reads the raw slot. A vector with a
  * non-finite component encodes to code 0 in that subspace (see
  * [[PqUtil.encode]]).
  */
case class PqEncode(child: Expression, cb: Array[Float], m: Int,
    ksub: Int, dsub: Int) extends UnaryExpression {

  require(cb.length == m * ksub * dsub,
    s"codebook length ${cb.length} != m*ksub*dsub = ${m * ksub * dsub}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqUtil.encode(input.asInstanceOf[ArrayData], cb, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqUtil.encode($c, $cbRef, $m, $ksub, $dsub)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native asymmetric-distance computation over PQ codes — the codegen
  * replacement for the HOF ADC ([[graft.operators.Ann.adcHof]]):
  * `Σ_j ‖sub_j(q) − cb[j][codes_j]‖²`. This is the expression the coarse
  * ANN scan runs on EVERY code row at 100 TB (the encode is a one-time
  * build cost; the ADC is the per-query hot path), so it must stay inside
  * whole-stage codegen. Float semantics match the HOF twin bit-for-bit:
  * per-dim squared difference in FLOAT, widened to double, summed per
  * subspace, subspace subtotals summed in order. */
case class PqAdc(left: Expression, right: Expression, cb: Array[Float],
    m: Int, ksub: Int, dsub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(cb.length == m * ksub * dsub,
    s"codebook length ${cb.length} != m*ksub*dsub = ${m * ksub * dsub}")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<tinyint> codes, array<float> query), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(codes: Any, qvec: Any): Any =
    PqUtil.adc(codes.asInstanceOf[ArrayData], qvec.asInstanceOf[ArrayData],
      cb, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "float[]")
    defineCodeGen(ctx, ev, (c, q) =>
      s"graft.functions.PqUtil.adc($c, $q, $cbRef, $m, $ksub, $dsub)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native inner-product ADC over PQ codes — the IP twin of [[PqAdc]]:
  * `Σ_j ⟨sub_j(q), cb[j][codes_j]⟩`. This is the kernel cosine/IP-metric
  * IVFADC ranks by (FAISS METRIC_INNER_PRODUCT): inner product is linear,
  * so for residual codes `⟨q, x⟩ ≈ ⟨q, centroid⟩ + Σ_j ⟨sub_j(q), e_j⟩` —
  * the caller adds the per-centroid `⟨q, c⟩` term and divides by the
  * stored vector norm to estimate the cosine. Same float semantics
  * discipline as [[PqAdc]]: per-dim product in FLOAT, widened to double,
  * summed per subspace, subtotals summed in order
  * ([[graft.operators.Ann.adcIpHof]] is the executable spec). */
case class PqAdcIp(left: Expression, right: Expression, cb: Array[Float],
    m: Int, ksub: Int, dsub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(cb.length == m * ksub * dsub,
    s"codebook length ${cb.length} != m*ksub*dsub = ${m * ksub * dsub}")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_ip expects (array<tinyint> codes, array<float> query), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def prettyName: String = "pq_adc_ip"

  override protected def nullSafeEval(codes: Any, qvec: Any): Any =
    PqUtil.adcIp(codes.asInstanceOf[ArrayData], qvec.asInstanceOf[ArrayData],
      cb, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "float[]")
    defineCodeGen(ctx, ev, (c, q) =>
      s"graft.functions.PqUtil.adcIp($c, $q, $cbRef, $m, $ksub, $dsub)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static helper shared by [[PqEncode]]'s interpreted and generated paths. */
object PqUtil {
  def encode(vec: ArrayData, cb: Array[Float], m: Int, ksub: Int,
      dsub: Int): ArrayData = {
    require(vec.numElements() == m * dsub,
      s"pq_encode: vector has ${vec.numElements()} dims, expected ${m * dsub}")
    val codes = new Array[Any](m)
    var j = 0
    while (j < m) {
      var best = -1
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d = 0.0d
        val base = (j * ksub + c) * dsub
        var i = 0
        while (i < dsub) {
          // FLOAT subtract and square, THEN widen — matches the HOF twin
          val diff = vec.getFloat(j * dsub + i) - cb(base + i)
          d += (diff * diff).toDouble
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      // a non-finite component makes every candidate distance NaN/Inf and
      // `d < bestD` never fires — fall back to code 0 (a VALID codebook
      // entry) instead of emitting sentinel -1, which ADC would decode as
      // 255 and index past the codebook (same fallback as the HOF twin)
      codes(j) = math.max(best, 0).toByte
      j += 1
    }
    new GenericArrayData(codes)
  }

  def adc(codes: ArrayData, qvec: ArrayData, cb: Array[Float], m: Int,
      ksub: Int, dsub: Int): Double = {
    require(codes.numElements() == m && qvec.numElements() == m * dsub,
      s"pq_adc: got ${codes.numElements()} codes / " +
        s"${qvec.numElements()} query dims, expected $m / ${m * dsub}")
    var total = 0.0d
    var j = 0
    while (j < m) {
      val c = codes.getByte(j) & 0xff
      val base = (j * ksub + c) * dsub
      var d = 0.0d
      var i = 0
      while (i < dsub) {
        // FLOAT subtract and square, THEN widen — matches the HOF twin
        val diff = qvec.getFloat(j * dsub + i) - cb(base + i)
        d += (diff * diff).toDouble
        i += 1
      }
      total += d
      j += 1
    }
    total
  }

  def adcIp(codes: ArrayData, qvec: ArrayData, cb: Array[Float], m: Int,
      ksub: Int, dsub: Int): Double = {
    require(codes.numElements() == m && qvec.numElements() == m * dsub,
      s"pq_adc_ip: got ${codes.numElements()} codes / " +
        s"${qvec.numElements()} query dims, expected $m / ${m * dsub}")
    var total = 0.0d
    var j = 0
    while (j < m) {
      val c = codes.getByte(j) & 0xff
      val base = (j * ksub + c) * dsub
      var d = 0.0d
      var i = 0
      while (i < dsub) {
        // FLOAT product, THEN widen — matches the HOF twin
        d += (qvec.getFloat(j * dsub + i) * cb(base + i)).toDouble
        i += 1
      }
      total += d
      j += 1
    }
    total
  }
}
