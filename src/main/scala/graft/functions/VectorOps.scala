package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native vector arithmetic for the similarity operators.
 *
 * The builtin formulation — `aggregate(zip_with(a, b, _*_), 0d, _+_)`
 * — is semantically right but runs interpreted (higher-order
 * functions sit outside whole-stage codegen) and allocates an
 * intermediate array per row. For ANN over billions of vectors the
 * dot product IS the hot loop, so it gets a dedicated
 * `BinaryExpression` with codegen: a tight primitive loop over
 * `ArrayData`, double accumulation in strict left-fold order —
 * bit-identical results to the HOF version (and to the DuckDB oracle
 * mirrors), ~10× less per-row overhead.
 */
object VectorOps {

  /** Strict left-fold dot product over float arrays. */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** Float × double (e.g. embedding × literal hyperplane weights). */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    s
  }

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

/**
 * `vector_dot(a, b)` — Σ aᵢ·bᵢ as double, strict left fold, over
 * array<float> / array<double> children (non-null elements; lengths
 * expected equal, extra elements on either side ignored).
 */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vector_dot expects array<float|double>, got $other")
  }

  private lazy val helper: String = (isFloat(left), isFloat(right)) match {
    case (true, true)   => "dotFF"
    case (true, false)  => "dotFD"
    case (false, false) => "dotDD"
    case (false, true)  => "dotFD" // commutative: swap at eval
  }
  private lazy val swapped = !isFloat(left) && isFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) =
      if (swapped) (b.asInstanceOf[ArrayData], a.asInstanceOf[ArrayData])
      else (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    helper match {
      case "dotFF" => VectorOps.dotFF(x, y)
      case "dotFD" => VectorOps.dotFD(x, y)
      case "dotDD" => VectorOps.dotDD(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (x, y) = if (swapped) (b, a) else (a, b)
      s"${ev.value} = graft.functions.VectorOps.$helper($x, $y);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}
