package graft.pipelines

import graft.{QueryDef, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.3 similarity search over the embedding column: brute-force
  * cosine top-k as the correctness baseline, sign-bit (LSH/IVF-style)
  * bucketing as the 100 TB path — candidates shrink ~2^bits-fold
  * before any scoring, and the bucket join is an ordinary hash join
  * Spark shuffles on the bucket key.
  */
object Similarity {

  private val K = 5
  private val NQueries = 10
  private val BucketBits = 8

  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), VectorOps.toDouble("embedding").as("v"))
      .withColumn("nn", VectorOps.norm2("v"))

  // -------------------------------------------------------------- ann01
  /** Brute-force cosine top-k for a bounded query set (vec_id < 10).
    * The query side is tiny => Catalyst broadcasts it; per-neighbor
    * ranking is a window over the query key. */
  private val ann01 = QueryDef(
    "ann01_knn_brute",
    (s, dir) => {
      val e = vecs(s, dir)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nn").as("qn"))
      val scored = broadcast(q).join(e, col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          VectorOps.cosine("qv", "v", "qn", "nn").as("cos"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id").asc)
      scored.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= K)
    },
    Some(s"""WITH e AS (SELECT vec_id,
      |  ${VectorOps.castSql("embedding")} AS v FROM embeddings),
      |n AS (SELECT vec_id, v, ${VectorOps.dotSql("v", "v")} AS nn FROM e),
      |scored AS (
      |  SELECT q.vec_id AS q_id, e2.vec_id AS n_id,
      |    ${VectorOps.cosineSql("q.v", "e2.v", "q.nn", "e2.nn")} AS cos
      |  FROM n q JOIN n e2 ON e2.vec_id <> q.vec_id
      |  WHERE q.vec_id < $NQueries)
      |SELECT q_id, n_id, cos, rn FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
      |    ORDER BY cos DESC, n_id ASC) AS rn FROM scored)
      |WHERE rn <= $K""".stripMargin))

  // -------------------------------------------------------------- ann02
  /** Sign-bit bucketed top-k: bucket = sign pattern of the first
    * [[BucketBits]] dims (a fixed random-hyperplane LSH with axis
    * planes). Scoring happens only inside the query's bucket. */
  private val ann02 = {
    // Spark arrays are 0-based (v[j]); DuckDB lists 1-based (v[j+1])
    val bucketSpark = (0 until BucketBits)
      .map(j => s"(CASE WHEN v[$j] > 0D THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
    val bucketSql = (0 until BucketBits)
      .map(j => s"(CASE WHEN v[${j + 1}] > 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
    QueryDef(
      "ann02_knn_bucket",
      (s, dir) => {
        val e = vecs(s, dir).withColumn("bucket", expr(bucketSpark))
        val q = e.filter(col("vec_id") < NQueries)
          .select(col("vec_id").as("q_id"), col("v").as("qv"),
            col("nn").as("qn"), col("bucket"))
        val scored = broadcast(q).join(e,
            Seq("bucket")).filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("n_id"), col("bucket"),
            VectorOps.cosine("qv", "v", "qn", "nn").as("cos"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id").asc)
        scored.withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
      },
      Some(s"""WITH e AS (SELECT vec_id,
        |  ${VectorOps.castSql("embedding")} AS v FROM embeddings),
        |n AS (SELECT vec_id, v, ${VectorOps.dotSql("v", "v")} AS nn,
        |  $bucketSql AS bucket FROM e),
        |scored AS (
        |  SELECT q.vec_id AS q_id, e2.vec_id AS n_id, q.bucket,
        |    ${VectorOps.cosineSql("q.v", "e2.v", "q.nn", "e2.nn")} AS cos
        |  FROM n q JOIN n e2
        |    ON q.bucket = e2.bucket AND e2.vec_id <> q.vec_id
        |  WHERE q.vec_id < $NQueries)
        |SELECT q_id, n_id, bucket, cos, rn FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
        |    ORDER BY cos DESC, n_id ASC) AS rn FROM scored)
        |WHERE rn <= 3""".stripMargin))
  }

  val defs: Seq[QueryDef] = Seq(ann01, ann02)
}
