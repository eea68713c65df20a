package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, expr, sqrt}
import org.apache.spark.sql.graft.ColumnBridge

/** Embedding-vector math as a codegen'd native expression ([[VecDot]]
  * — no UDFs, no per-row array allocation, SURVEY §2.3).
  *
  * Everything is a LEFT FOLD in element order on doubles, and the
  * DuckDB fragments ([[dotSql]] etc.) fold in the same order, so both
  * engines produce bit-identical results — float summation order is
  * the only nondeterminism vector math has.
  */
object VectorOps {

  /** array<float> column -> array<double> (exact widening). */
  def toDouble(c: String): Column = expr(s"CAST($c AS ARRAY<DOUBLE>)")

  /** Sequential dot product of two double-array columns. */
  def dot(a: String, b: String): Column =
    ColumnBridge.column(VecDot(
      ColumnBridge.expression(col(a)), ColumnBridge.expression(col(b))))

  /** Squared L2 norm. */
  def norm2(a: String): Column = dot(a, a)

  /** cos(a,b) given precomputed squared norms na, nb. */
  def cosine(a: String, b: String, na: String, nb: String): Column =
    dot(a, b) / (sqrt(col(na)) * sqrt(col(nb)))

  // ----------------------------------------------------- DuckDB twins

  def castSql(a: String): String = s"CAST($a AS DOUBLE[])"

  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> p[1] * p[2]), (x, y) -> x + y)"

  def cosineSql(a: String, b: String, na: String, nb: String): String =
    s"${dotSql(a, b)} / (sqrt($na) * sqrt($nb))"
}
