package graft.pipelines

import graft.{QueryDef, Tables}
import graft.functions.{VecLongSumAgg, VectorOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** §2.3 embedding-storage operators: int8 quantization (emb01) and
  * per-label centroids over the quantized codes (emb02) — the
  * compression + summary passes an embedding corpus takes before it
  * ships to training. At 100 TB the point of both is movement of
  * BYTES instead of doubles: a 64-dim float vector is 256 B raw,
  * 64 B as int8 codes + one scale, and emb02's aggregation ships one
  * length-d long array per (task, label) — never the corpus.
  *
  * Everything stays hash-exact against DuckDB: the quantizer uses
  * `floor(x*s + 0.5)` (identical IEEE ops in both engines — `round()`
  * would tie-break differently per engine), the reconstruction-error
  * fold runs in element order, and the centroid sums are INTEGER
  * (associative ⇒ partitioning-invariant, the property double sums
  * lack; mean emerges as one exact division at the edge).
  */
object Embeddings {

  private val MaxCode = 127

  /** Symmetric int8 quantization of double-array `v` given scalar
    * column `qscale`: code_i = clamp(floor(v_i*s + 0.5), ±127). */
  private def codesSpark(v: String, s: String): String =
    s"transform($v, x -> CAST(greatest(-${MaxCode}L, least(${MaxCode}L, " +
      s"CAST(floor(x * $s + 0.5d) AS BIGINT))) AS BIGINT))"

  private def codesSql(v: String, s: String): String =
    s"list_transform($v, x -> CAST(greatest(-$MaxCode, least($MaxCode, " +
      s"CAST(floor(x * $s + 0.5) AS BIGINT))) AS BIGINT))"

  /** vec_id, label, v (array<double>), amax, qscale, codes. */
  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        VectorOps.toDouble("embedding").as("v"))
      .withColumn("amax", expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("qscale",
        when(col("amax") > 0d, lit(MaxCode.toDouble) / col("amax"))
          .otherwise(lit(1.0)))
      .withColumn("codes", expr(codesSpark("v", "qscale")))

  private def quantizedSql: String =
    s"""q0 AS (SELECT vec_id, label,
       |  ${VectorOps.castSql("embedding")} AS v FROM embeddings),
       |q1 AS (SELECT vec_id, label, v,
       |  list_max(list_transform(v, x -> abs(x))) AS amax FROM q0),
       |q AS (SELECT vec_id, label, v, amax,
       |  CASE WHEN amax > 0 THEN ${MaxCode.toDouble} / amax ELSE 1.0 END
       |    AS qscale,
       |  ${codesSql("v", s"(CASE WHEN amax > 0 THEN ${MaxCode.toDouble} / amax ELSE 1.0 END)")}
       |    AS codes
       |  FROM q1)""".stripMargin

  // ------------------------------------------------------------- emb01
  /** Per-vector quantization audit: scale, reconstruction error
    * (ordered fold, so bit-equal across engines), saturation count.
    * Scalar columns only — the external harness hashes rows, and
    * array cells defeat the compare (ADVICE r3 / q35). One narrow
    * pass, rides the scan. */
  private val emb01 = QueryDef(
    "emb01_int8_quant",
    (s, dir) =>
      quantized(s, dir)
        .select(col("vec_id"),
          size(col("v")).cast("long").as("n_dims"),
          col("amax"), col("qscale"),
          sqrt(expr(
            """aggregate(zip_with(v, codes,
              |  (x, c) -> (x - c / qscale) * (x - c / qscale)),
              |  0D, (a, y) -> a + y)""".stripMargin)).as("err_l2"),
          expr(s"size(filter(codes, c -> abs(c) = $MaxCode))")
            .cast("long").as("n_sat")),
    Some(s"""WITH $quantizedSql
      |SELECT vec_id, CAST(len(v) AS BIGINT) AS n_dims, amax, qscale,
      |  sqrt(list_reduce(list_transform(list_zip(v, codes),
      |    p -> (p[1] - p[2] / qscale) * (p[1] - p[2] / qscale)),
      |    (x, y) -> x + y)) AS err_l2,
      |  CAST(len(list_filter(codes, c -> abs(c) = $MaxCode)) AS BIGINT)
      |    AS n_sat
      |FROM q""".stripMargin))

  // ------------------------------------------------------------- emb02
  /** Per-label centroid of the quantized codes via the native
    * [[VecLongSumAgg]] — ONE length-d array per (task, label) crosses
    * the exchange (map-side partial merge), vs the d-fold row
    * multiplication a posexplode→groupBy(label, idx) plan shuffles.
    * The long-array result unpacks to (label, idx) rows only AFTER
    * aggregation, when there are labels×d of them. Integer sums make
    * the result partitioning-invariant, so the oracle hash-matches. */
  private val emb02 = QueryDef(
    "emb02_label_centroid",
    (s, dir) => {
      val sums = quantized(s, dir)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          ColumnBridge.column(
            VecLongSumAgg(ColumnBridge.expression(col("codes")))
              .toAggregateExpression()).as("sums"))
      sums.select(col("label"), col("n_vecs"),
          posexplode(col("sums")).as(Seq("idx", "sum_code")))
        .select(col("label"), col("idx").cast("long").as("idx"),
          col("n_vecs"), col("sum_code"),
          (col("sum_code").cast("double") / col("n_vecs")).as("mean_code"))
    },
    Some(s"""WITH $quantizedSql,
      |x AS (SELECT label, i - 1 AS idx, codes[i] AS code
      |  FROM q CROSS JOIN LATERAL
      |    (SELECT unnest(generate_series(1, len(codes))) AS i) t)
      |SELECT label, CAST(idx AS BIGINT) AS idx,
      |  COUNT(*) AS n_vecs,
      |  CAST(SUM(code) AS BIGINT) AS sum_code,
      |  CAST(SUM(code) AS DOUBLE) / COUNT(*) AS mean_code
      |FROM x GROUP BY label, idx""".stripMargin))

  val defs: Seq[QueryDef] = Seq(emb01, emb02)
}
