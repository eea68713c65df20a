package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** y = W·(v − μ): the distributed half of emb04's PCA/whitening — a
  * k×d matrix (k·d + d doubles, computed once on the driver from the
  * [[GramMatrixAgg]] moments) applied to every corpus vector as ONE
  * codegen'd expression riding the scan. The matrix travels inside
  * the expression tree as a reference object, so at 100 TB each
  * executor holds one 4 KB array — never a join, never a shuffle.
  *
  * Row-major `w` (k rows of d), centered then projected in fixed
  * element order — deterministic per row, independent of
  * partitioning. Null input array → null; null ELEMENTS are treated
  * as 0 after centering offset (i.e. contribute −μ_i), matching the
  * quantize-null-as-zero convention of the moment pass.
  */
case class MatVecProject(
    child: Expression, mu: Array[Double], w: Array[Double])
  extends UnaryExpression {

  private val d = mu.length
  private val k = if (d == 0) 0 else w.length / d
  require(d > 0 && w.length == k * d,
    s"w length ${w.length} must be k·d for d=$d")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec_project requires ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MatVecProject.project(input.asInstanceOf[ArrayData], mu, w, k, d)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val muRef = ctx.addReferenceObj("mu", mu, "double[]")
    val wRef = ctx.addReferenceObj("w", w, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.MatVecProject.project(
         |  $a, $muRef, $wRef, $k, $d);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MatVecProject =
    copy(child = c)
}

object MatVecProject {
  def project(
      xs: ArrayData, mu: Array[Double], w: Array[Double],
      k: Int, d: Int): GenericArrayData = {
    require(xs.numElements() == d,
      s"mat_vec_project: expected dim $d, row has ${xs.numElements()}")
    val c = new Array[Double](d)
    var i = 0
    while (i < d) {
      c(i) = (if (xs.isNullAt(i)) 0.0 else xs.getDouble(i)) - mu(i)
      i += 1
    }
    val y = new Array[Double](k)
    var r = 0
    while (r < k) {
      var s = 0.0
      val base = r * d
      i = 0
      while (i < d) { s += w(base + i) * c(i); i += 1 }
      y(r) = s
      r += 1
    }
    new GenericArrayData(y)
  }
}
