package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd vector kernels over `array<double>`.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) are
  * CodegenFallback — every element bounces through an interpreted
  * lambda with variable binding. For the similarity operators that
  * is THE hot loop (millions of pairs x 64 dims), so these kernels
  * generate a plain Java loop instead: measured ~10x on the
  * brute-force pair join.
  *
  * Both accumulate LEFT-TO-RIGHT in double, the exact IEEE op
  * sequence of the fold-based SQL form and of DuckDB's list_reduce —
  * results are bit-identical, so the DuckDB oracles keep matching.
  */
object VectorOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def sqDist(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); acc += d * d; i += 1 }
    acc
  }
}

abstract class VectorKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType
  /** static method on VectorOps implementing the kernel */
  def kernel: String

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel match {
      case "dot"    => VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      case "sqDist" => VectorOps.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.$kernel($a, $b)")
}

/** `vec_dot(array<double>, array<double>) → double` */
case class VecDotExpr(left: Expression, right: Expression) extends VectorKernel {
  override def kernel: String = "dot"
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotExpr =
    copy(left = l, right = r)
}

/** `vec_sqdist(array<double>, array<double>) → double` */
case class VecSqDistExpr(left: Expression, right: Expression) extends VectorKernel {
  override def kernel: String = "sqDist"
  override def prettyName: String = "vec_sqdist"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSqDistExpr =
    copy(left = l, right = r)
}
