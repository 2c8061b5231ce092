package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass SQ8 quantization of a float vector —
  * `struct(q8: array<tinyint>, scale: float)` — the codegen replacement
  * for the higher-order-function form (kept as
  * `Ann.quantizeSq8Hof`, its executable spec).
  *
  * Why this exists: in the HOF form the per-row `amax` fold appears
  * INSIDE the `transform` lambda (the scale expression references it),
  * and Catalyst inlines rather than shares it — interpreted lambda
  * evaluation then re-runs the full 64-element aggregate for EVERY
  * element of every row (~2·dim² lambda invocations per row; measured:
  * the SQ8 coarse scan over a 2 000-row fixture cost 1.2-1.6 s of pure
  * re-evaluation while the scan itself costs 0.17 s). Subexpression
  * elimination cannot reach inside lambda functions, so the fix is a
  * native expression that walks the array exactly twice (amax pass,
  * quantize pass) inside whole-stage codegen.
  *
  * Arithmetic matches the HOF form bit-for-bit (parity spec):
  *  - `amax` = float max over finite `|x|` (NaN/±Inf contribute 0);
  *  - `scale` = `amax > 0 ? ((double) amax / 127.0).toFloat : 1.0f`
  *    (the double-divide-then-narrow Catalyst inserts for
  *    `float / float` division);
  *  - `q8_i` = finite(x) ? `round(x / scale, 0)` cast tinyint : 0,
  *    with `round` the Spark HALF_UP BigDecimal rounding;
  *  - a null ELEMENT quantizes to 0 and contributes 0 to amax (the
  *    CASE-through-null behavior of the lambda); a null ARRAY returns
  *    a null struct (the HOF twin instead yields (null, 1.0f) — no
  *    caller feeds null vectors; documented difference).
  */
case class Sq8Quantize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"sq8_quantize expects array<float>, got ${t.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("q8", ArrayType(ByteType, containsNull = false),
      nullable = false),
    StructField("scale", FloatType, nullable = false)))

  override def prettyName: String = "sq8_quantize"

  override def nullSafeEval(vec: Any): Any =
    Sq8QuantizeUtil.quantize(vec.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.Sq8QuantizeUtil.quantize($v)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Static helper shared by [[Sq8Quantize]]'s interpreted and generated
  * paths. */
object Sq8QuantizeUtil {
  private def finite(x: Float): Boolean =
    !java.lang.Float.isNaN(x) && math.abs(x) <= Float.MaxValue

  def quantize(vec: ArrayData): InternalRow = {
    val n = vec.numElements()
    var amax = 0.0f
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val x = vec.getFloat(i)
        if (finite(x) && math.abs(x) > amax) amax = math.abs(x)
      }
      i += 1
    }
    val scale = if (amax > 0.0f) (amax.toDouble / 127.0).toFloat else 1.0f
    val q8 = new Array[Byte](n)
    i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val x = vec.getFloat(i)
        if (finite(x)) {
          // Spark round(double, 0): BigDecimal HALF_UP (Math.round would
          // diverge on negative .5 ties), then the double→tinyint cast
          q8(i) = java.math.BigDecimal.valueOf(x.toDouble / scale.toDouble)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toByte
        }
      }
      i += 1
    }
    InternalRow(new GenericArrayData(q8), scale)
  }
}
