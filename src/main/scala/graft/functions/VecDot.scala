package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Tight-loop runtime for vector math (no per-pair array allocation,
  * no lambda interpretation — the reason this exists; `zip_with` +
  * `aggregate` allocate an intermediate array per row pair and cost
  * ~50x on an all-pairs similarity join).
  */
object VecRuntime {
  /** Sequential dot product, index order — bit-identical to the
    * `aggregate(zip_with(...), 0D, +)` left fold it replaces (and to
    * DuckDB's list_reduce), so oracle parity is preserved exactly.
    *
    * The dispatch dance matters: in a long-lived JVM that has profiled
    * many ArrayData subclasses, a call through the abstract type goes
    * megamorphic and stops inlining (10-30x observed). The instanceof
    * split gives each branch a monomorphic receiver — UnsafeArrayData
    * reads its backing memory directly with zero copies; everything
    * else takes one bulk `toDoubleArray` on its exact static type. */
  def dot(a: ArrayData, b: ArrayData): Double = a match {
    case ua: UnsafeArrayData => b match {
      case ub: UnsafeArrayData => dotUnsafe(ua, ub)
      case _ => dotArr(ua.toDoubleArray(), b.toDoubleArray())
    }
    case _ => dotArr(a.toDoubleArray(), b.toDoubleArray())
  }

  private def dotUnsafe(a: UnsafeArrayData, b: UnsafeArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  private def dotArr(xs: Array[Double], ys: Array[Double]): Double = {
    val n = math.min(xs.length, ys.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += xs(i) * ys(i); i += 1 }
    acc
  }
}

/** Codegen'd dot product over two array<double> columns. Stays inside
  * whole-stage codegen via a direct static call. */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecRuntime.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecRuntime.dot($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDot = copy(l, r)
}
