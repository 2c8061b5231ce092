package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Fused cosine similarity between an SQ8-quantized vector and a float
  * query — the codegen replacement for
  * `cosine_sim(dequantizeSq8(q8, scale), qvec)` where the dequantize is an
  * interpreted `transform` that allocates a float array per row. This is
  * the SQ8 tier's per-query coarse-scan hot path (the relation it scans is
  * the 4×-smaller quantized one), so it must stay inside whole-stage
  * codegen with zero per-row allocation.
  *
  * Arithmetic matches the composed form bit-for-bit: element =
  * `(float) q8_i · scale` in FLOAT, then the [[CosineSimilarity]]
  * sequential double accumulation (dot/norms, zero-norm → 0.0).
  */
case class Sq8Cosine(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(ByteType, _), FloatType, ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"sq8_cosine expects (array<tinyint>, float, array<float>), " +
          s"got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "sq8_cosine"

  override def nullSafeEval(q8: Any, scale: Any, qvec: Any): Any =
    Sq8Util.cosine(q8.asInstanceOf[ArrayData],
      scale.asInstanceOf[Float], qvec.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q8, s, q) =>
      s"graft.functions.Sq8Util.cosine($q8, $s, $q)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Static helper shared by [[Sq8Cosine]]'s interpreted and generated
  * paths. */
object Sq8Util {
  def cosine(q8: ArrayData, scale: Float, qvec: ArrayData): Double = {
    val n = math.min(q8.numElements(), qvec.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      // FLOAT dequantize, THEN widen — matches transform + cosine_sim
      val xi = (q8.getByte(i).toFloat * scale).toDouble
      val yi = qvec.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
