package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

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

  /** Declarative-fold-faithful variant: NULL on length mismatch (the
    * zip_with null-pad propagates through the sum) and, when the
    * element type is nullable, NULL if any element is null — exactly
    * what `aggregate(zip_with(a, b, *), 0D, +)` returns, so
    * [[graft.RewriteZipWithDot]] is semantics-preserving on every
    * input, not just the well-formed ones. */
  def dotOrNull(a: ArrayData, b: ArrayData, checkElemNulls: Boolean): java.lang.Double = {
    if (a.numElements() != b.numElements()) return null
    if (checkElemNulls && (anyNull(a) || anyNull(b))) return null
    java.lang.Double.valueOf(dot(a, b))
  }

  private def anyNull(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
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

/** Codegen'd dot product over two array<double> columns, with the
  * exact null semantics of the declarative fold it replaces: NULL for
  * null inputs, unequal lengths, or (when the element type is
  * nullable) null elements. The element-null scan is compiled out
  * entirely when both children's array types are statically
  * non-nullable — the common case after `CAST(... AS ARRAY<DOUBLE>)`
  * of non-null floats. */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def mayHaveNullElems: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecRuntime.dotOrNull(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], mayHaveNullElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("vecDot")
      s"""
         |java.lang.Double $tmp =
         |  graft.functions.VecRuntime.dotOrNull($a, $b, $mayHaveNullElems);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDot = copy(l, r)
}
