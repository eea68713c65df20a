package graft.pipelines

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared word-shingling for the dedup/fingerprint family. Tokens are
  * whitespace-split, empties dropped; a k-shingle is k consecutive
  * tokens joined by one space. Shingling is a per-row narrow transform
  * (no shuffle) — at 100 TB it rides the scan.
  */
object TextShingles {

  /** (doc_id, ws: array<string>) with empty tokens removed. */
  def words(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, '\\\\s+'), x -> x <> '')").as("ws"))

  /** Exploded k-shingles: (doc_id, sg). Docs with < k tokens emit none. */
  def shingles(s: SparkSession, dir: String, k: Int): DataFrame =
    words(s, dir)
      .filter(size(col("ws")) >= k)
      .select(col("doc_id"), explode(expr(shingleArray(k))).as("sg"))

  /** k-shingles as an ARRAY column expression over `ws` — the
    * no-explode path: per-doc shingle processing (signatures, set
    * intersections) happens with array functions on the doc row, so
    * nothing row-multiplies before a shuffle. Empty when < k tokens.
    */
  def shingleArray(k: Int): String =
    s"CASE WHEN size(ws) >= $k THEN transform(sequence(1, size(ws) - ${k - 1}), " +
    s"i -> concat_ws(' ', ${(0 until k).map(j => s"ws[i + ${j - 1}]").mkString(", ")})) " +
    "ELSE array() END"

  /** DuckDB twin of [[words]] + [[shingles]] as WITH-clauses `w`, `sh`. */
  def shinglesSql(k: Int): String = {
    val cols = (0 until k).map(j => s"ws[i + $j]").mkString(" || ' ' || ")
    s"""w AS (SELECT doc_id,
       |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
       |  FROM documents),
       |sh AS (SELECT doc_id, $cols AS sg
       |  FROM w CROSS JOIN LATERAL
       |    (SELECT unnest(generate_series(1, len(ws) - ${k - 1})) AS i) t)""".stripMargin
  }
}
