package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** argmin_c ‖v − μ_c‖² — the assignment half of a Lloyd/k-means
  * iteration (emb05), as ONE codegen'd expression riding the scan.
  * The k×d centroid matrix and its squared norms travel inside the
  * expression tree as reference objects (k=8, d=64 → 4 KB), so at
  * 100 TB assignment is a pure map: no centroid join, no explode to
  * (vector, centroid) pairs, no shuffle — the k·n candidate blowup a
  * relational argmin (cross join + window) pays never materializes.
  *
  * Distance is expanded as ‖v‖² − 2⟨v,μ_c⟩ + ‖μ_c‖² with every fold
  * LEFT-TO-RIGHT from 0.0 in element order — the exact IEEE op
  * sequence of the oracle's `qq - 2 * list_reduce(...) + mm`, so both
  * engines compute bit-identical distances and therefore identical
  * argmins. Ties (exactly equal distances) keep the LOWEST centroid
  * id via strict `<`, matching the oracle's `ORDER BY d ASC, cid
  * ASC` pick. Null input array → null; null ELEMENTS count as 0.0
  * (the quantize-null-as-zero convention of [[MatVecProject]] and
  * [[GramMatrixAgg]]).
  */
case class NearestCentroid(
    child: Expression, cents: Array[Double], norms: Array[Double])
  extends UnaryExpression {

  private val k = norms.length
  private val d = if (k == 0) 0 else cents.length / k
  require(k > 0 && cents.length == k * d,
    s"cents length ${cents.length} must be k·d for k=$k")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NearestCentroid.assign(input.asInstanceOf[ArrayData], cents, norms, k, d)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cents, "double[]")
    val nRef = ctx.addReferenceObj("norms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.NearestCentroid.assign(
         |  $a, $cRef, $nRef, $k, $d);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

object NearestCentroid {
  /** One O(k·d) pass; see the class doc for the exactness contract. */
  def assign(v: ArrayData, cents: Array[Double], norms: Array[Double],
      k: Int, d: Int): Long = {
    val n = math.min(d, v.numElements())
    var qq = 0.0
    var i = 0
    while (i < n) {
      val x = if (v.isNullAt(i)) 0.0 else v.getDouble(i)
      qq += x * x
      i += 1
    }
    var best = 0L
    var bestDist = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        val x = if (v.isNullAt(j)) 0.0 else v.getDouble(j)
        dot += x * cents(c * d + j)
        j += 1
      }
      val dist = qq - 2.0 * dot + norms(c)
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    best
  }
}
