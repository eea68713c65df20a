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
  private[pipelines] def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        VectorOps.toDouble("embedding").as("v"))
      .withColumn("amax", expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("qscale",
        when(col("amax") > 0d, lit(MaxCode.toDouble) / col("amax"))
          .otherwise(lit(1.0)))
      .withColumn("codes", expr(codesSpark("v", "qscale")))

  private[pipelines] def quantizedSql: String =
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

  // ------------------------------------------------------------- emb03
  /** Dimension-truncation (matryoshka-style) retrieval audit: would
    * storing only the first d/2 dimensions preserve nearest-neighbor
    * structure? For each query, brute-force top-5 on the FULL vectors
    * and on the TRUNCATED prefix, and report the overlap — the
    * measurement behind a 2× storage-tier decision (keep half the
    * dims hot, full vectors cold). Both sides are ordered folds +
    * rank windows, so DuckDB reproduces them bit-for-bit; the overlap
    * is a small self-join on the two top-5 sets. The corpus is scored
    * twice (two broadcast-probe passes) — still linear, and at 100 TB
    * the truncated pass reads half the bytes, which is the point. */
  private val emb03 = {
    val K = 5
    val NQueries = 10
    val HalfDims = 32
    QueryDef(
      "emb03_trunc_recall",
      (s, dir) => {
        def top5(vcol: String => org.apache.spark.sql.Column): DataFrame = {
          val e = Tables.load(s, dir, "embeddings")
            .select(col("vec_id"), vcol("embedding").as("v"))
            .withColumn("nn", VectorOps.norm2("v"))
          val q = e.filter(col("vec_id") < NQueries)
            .select(col("vec_id").as("q_id"), col("v").as("qv"),
              col("nn").as("qn"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("q_id"))
            .orderBy(col("cos").desc, col("n_id").asc)
          broadcast(q).join(e, col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id").as("n_id"),
              VectorOps.cosine("qv", "v", "qn", "nn").as("cos"))
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") <= K)
            .select(col("q_id"), col("n_id"))
        }
        val full = top5(c => VectorOps.toDouble(c))
        val trunc = top5(c =>
          expr(s"slice(CAST($c AS ARRAY<DOUBLE>), 1, $HalfDims)"))
        full.join(trunc, Seq("q_id", "n_id"))
          .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
          .join(full.select(col("q_id")).distinct(), Seq("q_id"), "right")
          .select(col("q_id"),
            coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      },
      Some(s"""WITH e AS (SELECT vec_id,
        |  ${VectorOps.castSql("embedding")} AS v FROM embeddings),
        |fn AS (SELECT vec_id, v, ${VectorOps.dotSql("v", "v")} AS nn FROM e),
        |ft AS (SELECT q.vec_id AS q_id, e2.vec_id AS n_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      ${VectorOps.cosineSql("q.v", "e2.v", "q.nn", "e2.nn")} DESC,
        |      e2.vec_id ASC) AS rn
        |  FROM fn q JOIN fn e2 ON e2.vec_id <> q.vec_id
        |  WHERE q.vec_id < $NQueries),
        |t AS (SELECT vec_id, v[1:$HalfDims] AS v FROM e),
        |tn AS (SELECT vec_id, v, ${VectorOps.dotSql("v", "v")} AS nn FROM t),
        |tt AS (SELECT q.vec_id AS q_id, e2.vec_id AS n_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      ${VectorOps.cosineSql("q.v", "e2.v", "q.nn", "e2.nn")} DESC,
        |      e2.vec_id ASC) AS rn
        |  FROM tn q JOIN tn e2 ON e2.vec_id <> q.vec_id
        |  WHERE q.vec_id < $NQueries),
        |f5 AS (SELECT q_id, n_id FROM ft WHERE rn <= $K),
        |t5 AS (SELECT q_id, n_id FROM tt WHERE rn <= $K),
        |ov AS (SELECT f5.q_id, COUNT(*) AS n_overlap
        |  FROM f5 JOIN t5 USING (q_id, n_id) GROUP BY f5.q_id)
        |SELECT q.q_id, CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap
        |FROM (SELECT DISTINCT q_id FROM f5) q
        |LEFT JOIN ov ON q.q_id = ov.q_id
        |""".stripMargin))
  }

  // ------------------------------------------------------------- emb04
  /** PCA/whitening of the embedding corpus — the preprocessing stage a
    * FAISS-style index pipeline runs before quantizing (PCAMatrix /
    * OPQ's first half): project every vector onto the top
    * [[Emb04K]] principal axes of the corpus covariance, scaled to
    * unit variance.
    *
    * Scale shape (SURVEY §5): pass 1 is ONE
    * [[graft.functions.GramMatrixAgg]] aggregation — O(d²) longs of
    * state per task, one ~34 KB row to the driver, integer-exact and
    * therefore partitioning-invariant. The d×d eigensolve
    * ([[graft.functions.SymEigen]], deterministic cyclic Jacobi) is
    * driver-side O(d³) — corpus-independent, the one place a 100 TB
    * job SHOULD centralize. Pass 2 applies y = W·(v−μ) as one
    * codegen'd expression ([[graft.functions.MatVecProject]]) riding
    * the scan, the k×d matrix shipped as a 4 KB expression constant.
    * Two linear passes total; nothing shuffles but the moment row.
    *
    * No SQL oracle BY DESIGN (DuckDB has no eigensolver) — rows-only
    * at the driver gate, like ann03/ann04; PipelineSpec carries the
    * correctness load instead: exact-integer moment checks against a
    * sequential reference, repartition-invariance of the full output,
    * eigen residuals, and whitened-covariance ≈ I. */
  private val Emb04K = 8
  private val emb04 = QueryDef(
    "emb04_pca",
    (s, dir) => {
      import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
      val vs = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.toDouble("embedding").as("v"))
      val (mean, w, varKeptFrac) = pcaModel(vs)
      val k = w.length / mean.length
      vs.select(col("vec_id"),
          column(graft.functions.MatVecProject(
            expression(col("v")), mean, w)).as("y"))
        .select(
          (col("vec_id") +:
            (0 until k).map(r => element_at(col("y"), r + 1).as(s"y$r"))) :+
            lit(varKeptFrac).as("var_kept_frac"): _*)
    },
    None)

  /** Driver-side model fit from the one-pass integer moments:
    * (μ, row-major whitening matrix W (k×d), kept-variance fraction).
    * Exposed for specs. */
  private[pipelines] def pcaModel(
      vs: DataFrame): (Array[Double], Array[Double], Double) = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val m = vs
      .agg(column(graft.functions.GramMatrixAgg(expression(col("v")))
        .toAggregateExpression()).as("m"))
      .head().getSeq[Double](0).toArray
    val d = m(0).toInt
    val n = m(1)
    val q = graft.functions.GramMatrixAgg.Scale
    val mean = Array.tabulate(d)(i => m(2 + i) / n / q)
    val cov = Array.ofDim[Double](d, d)
    var c = 2 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val e = m(c) / n / (q * q) - mean(i) * mean(j)
        cov(i)(j) = e; cov(j)(i) = e
        c += 1; j += 1
      }
      i += 1
    }
    val (vals, vecs) = graft.functions.SymEigen.decompose(cov)
    val k = math.min(Emb04K, d)
    val lmax = math.max(vals(0), 0.0)
    val w = new Array[Double](k * d)
    var r = 0
    while (r < k) {
      // degenerate directions (λ ≲ 0 numerically) project to 0 rather
      // than amplifying noise by 1/sqrt(λ)
      val lam = vals(r)
      val s0 = if (lam > 1e-12 * lmax) 1.0 / math.sqrt(lam) else 0.0
      var t = 0
      while (t < d) { w(r * d + t) = vecs(r)(t) * s0; t += 1 }
      r += 1
    }
    val varTot = vals.sum
    val varKept = vals.take(k).sum
    (mean, w, if (varTot > 0) varKept / varTot else 0.0)
  }

  val defs: Seq[QueryDef] = Seq(emb01, emb02, emb03, emb04)
}
