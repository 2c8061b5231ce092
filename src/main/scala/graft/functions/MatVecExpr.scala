package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Static matrix–vector kernel shared by interpreted eval and generated
  * code (the [[PqUtil]] convention): `y = M·x` with a row-major
  * `float[rows·cols]` matrix. Each output component accumulates in
  * DOUBLE and narrows to float once — one rounding per component,
  * deterministic for a fixed matrix regardless of partitioning (the
  * loop order is the row-major index order, not data order). */
object MatVecUtil {
  def apply(x: ArrayData, mat: Array[Float], rows: Int,
      cols: Int): GenericArrayData = {
    val out = new Array[Any](rows)
    var i = 0
    while (i < rows) {
      var acc = 0.0
      var j = 0
      val base = i * cols
      while (j < cols) {
        acc += mat(base + j).toDouble * x.getFloat(j)
        j += 1
      }
      out(i) = acc.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Whole-stage-codegen dense rotation `y = M·x` over an `array<float>`
  * column — the apply step of a learned orthogonal transform (PCA /
  * OPQ-style rotation, see [[graft.operators.Ann.buildPcaRotation]]).
  * A d×d rotation is d² multiply-adds per row; as nested SQL
  * expressions that is a 4096-term tree (codegen blow-up), and as a
  * higher-order function it runs interpreted with a per-row lambda per
  * output dim — this expression keeps the whole map pass in one flat
  * generated loop, the same split that makes [[PqEncode]] viable on the
  * encode scan. The matrix rides along as a flat row-major `float[]`
  * reference object (d² floats — bounded, broadcast with the plan). */
case class MatVecFloat(child: Expression,
    mat: scala.collection.immutable.ArraySeq[Float], rows: Int,
    cols: Int) extends UnaryExpression {

  require(rows > 0 && cols > 0 && mat.length == rows * cols,
    s"matrix length ${mat.length} != rows*cols = ${rows * cols}")

  // The matrix rides the case class as an immutable ArraySeq so that
  // case-class equality is ELEMENT-WISE: with a raw Array[Float] field,
  // equality is by reference and two identical rotation expressions
  // never canonicalize equal — defeating CSE and plan-cache matching
  // (r11 advice). Eval/codegen use the backing primitive array.
  @transient private lazy val matArr: Array[Float] = mat.unsafeArray match {
    case a: Array[Float] => a
    case _ => mat.toArray
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def prettyName: String = "mat_vec"

  override protected def nullSafeEval(input: Any): Any =
    MatVecUtil(input.asInstanceOf[ArrayData], matArr, rows, cols)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("matVecMat", matArr, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MatVecUtil.apply($c, $matRef, $rows, $cols)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatVecFloat {
  /** Array-accepting constructor (zero-copy wrap; callers must not
    * mutate the matrix after construction). */
  def apply(child: Expression, mat: Array[Float], rows: Int,
      cols: Int): MatVecFloat =
    MatVecFloat(child,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(mat), rows, cols)
}
