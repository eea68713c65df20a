package graft.pipelines

import graft.{QueryDef, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** §2.3 deduplication family for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine. Every
  * variant is banded/bucketed hash joins — candidate generation never
  * goes quadratic in corpus size (SURVEY §5); the only O(n²) op is the
  * small-bounded embedding near-dup baseline, whose scale path is
  * [[Similarity]]'s bucketed ANN.
  */
object Dedup {

  private val Bands = 4

  // -------------------------------------------------------------- dd01
  /** Exact dedup: content-hash groupBy, min doc_id survives. */
  private val dd01 = QueryDef(
    "dd01_dedup_exact",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(
          min(col("doc_id")).as("keeper"),
          count(lit(1)).as("n_copies"),
          sum(col("n_chars")).as("bytes_total")),
    Some("""SELECT md5(text) AS h, MIN(doc_id) AS keeper,
      | COUNT(*) AS n_copies, CAST(SUM(n_chars) AS BIGINT) AS bytes_total
      |FROM documents GROUP BY md5(text)""".stripMargin))

  // -------------------------------------------------------------- dd02
  /** MinHash+LSH candidate pairs: 3-word shingles, per-band min-hash
    * signature (min over md5 of salted shingle — a hash-order min is a
    * one-permutation MinHash), pairs bucket-join on (band, sig).
    */
  private val dd02 = QueryDef(
    "dd02_minhash_lsh",
    (s, dir) => {
      val sh = TextShingles.shingles(s, dir, 3)
      val sig = sh
        .withColumn("b", explode(expr(
          s"sequence(0, ${Bands - 1})")))
        .groupBy(col("doc_id"), col("b"))
        .agg(min(md5(concat(col("b").cast("string"), lit("|"), col("sg"))))
          .as("sig"))
      sig.as("s1").join(sig.as("s2"),
          col("s1.b") === col("s2.b") && col("s1.sig") === col("s2.sig") &&
          col("s1.doc_id") < col("s2.doc_id"))
        .select(col("s1.doc_id").as("d1"), col("s2.doc_id").as("d2"))
        .distinct()
    },
    Some(s"""WITH ${TextShingles.shinglesSql(3)},
      |sig AS (
      |  SELECT doc_id, b,
      |    MIN(md5(CAST(b AS VARCHAR) || '|' || sg)) AS sig
      |  FROM sh CROSS JOIN
      |    (SELECT unnest(generate_series(0, ${Bands - 1})) AS b) bands
      |  GROUP BY doc_id, b)
      |SELECT DISTINCT s1.doc_id AS d1, s2.doc_id AS d2
      |FROM sig s1 JOIN sig s2
      |  ON s1.b = s2.b AND s1.sig = s2.sig AND s1.doc_id < s2.doc_id
      |""".stripMargin))

  // -------------------------------------------------------------- dd03
  /** SimHash: 32-bit fingerprint from per-token hashes; 8-bit bands
    * for hamming-neighborhood bucketing. Single-pass: 32 conditional
    * sums per doc, fingerprint assembled from the signs. */
  private val dd03 = {
    val bitSums = (0 until 32).map(j =>
      s"SUM(CASE WHEN ((v >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(", ")
    val fp = (0 until 32).map(j =>
      s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    QueryDef(
      "dd03_simhash",
      (s, dir) => {
        val words = TextShingles.words(s, dir)
          .select(col("doc_id"), explode(col("ws")).as("w"))
          .withColumn("v", conv(substring(md5(col("w")), 1, 8), 16, 10)
            .cast("long"))
        words.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            (0 until 32).map(j => expr(
              s"SUM(CASE WHEN ((v >> $j) & 1) = 1 THEN 1 ELSE -1 END)")
              .as(s"s$j")): _*)
          .select(col("doc_id"), col("n_tokens"),
            expr(fp).as("simhash"))
          .select(col("doc_id"), col("n_tokens"), col("simhash"),
            expr("(simhash >> 24) & 255").as("band3"),
            expr("(simhash >> 16) & 255").as("band2"),
            expr("(simhash >> 8) & 255").as("band1"),
            expr("simhash & 255").as("band0"))
      },
      Some(s"""WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |tok AS (SELECT doc_id,
        |  CAST('0x' || substr(md5(t.w), 1, 8) AS BIGINT) AS v
        |  FROM w CROSS JOIN LATERAL (SELECT unnest(ws) AS w) t),
        |sums AS (SELECT doc_id, COUNT(*) AS n_tokens, $bitSums
        |  FROM tok GROUP BY doc_id),
        |fp AS (SELECT doc_id, n_tokens, $fp AS simhash FROM sums)
        |SELECT doc_id, n_tokens, simhash,
        | (simhash >> 24) & 255 AS band3, (simhash >> 16) & 255 AS band2,
        | (simhash >> 8) & 255 AS band1, simhash & 255 AS band0
        |FROM fp""".stripMargin))
  }

  // -------------------------------------------------------------- dd04
  /** n-gram Jaccard verification over the LSH candidates: exact
    * |A∩B|/|A∪B| on distinct 3-shingle sets, only for pairs the bands
    * surfaced (candidate-bounded — never all-pairs). */
  private val dd04 = QueryDef(
    "dd04_ngram_jaccard",
    (s, dir) => {
      val sh = TextShingles.shingles(s, dir, 3)
      val shd = sh.distinct()
      val sizes = shd.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val sig = sh
        .withColumn("b", explode(expr(s"sequence(0, ${Bands - 1})")))
        .groupBy(col("doc_id"), col("b"))
        .agg(min(md5(concat(col("b").cast("string"), lit("|"), col("sg"))))
          .as("sig"))
      val cand = sig.as("s1").join(sig.as("s2"),
          col("s1.b") === col("s2.b") && col("s1.sig") === col("s2.sig") &&
          col("s1.doc_id") < col("s2.doc_id"))
        .select(col("s1.doc_id").as("d1"), col("s2.doc_id").as("d2"))
        .distinct()
      val inter = cand
        .join(shd.as("a"), col("d1") === col("a.doc_id"))
        .join(shd.as("b"),
          col("d2") === col("b.doc_id") && col("a.sg") === col("b.sg"))
        .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("n_inter"))
      inter
        .join(sizes.as("za"), col("d1") === col("za.doc_id"))
        .join(sizes.as("zb"), col("d2") === col("zb.doc_id"))
        .select(col("d1"), col("d2"), col("n_inter"),
          col("za.n").as("n_a"), col("zb.n").as("n_b"),
          (col("n_inter").cast("double") /
            (col("za.n") + col("zb.n") - col("n_inter"))).as("jaccard"))
        .filter(col("jaccard") >= 0.2)
    },
    Some(s"""WITH ${TextShingles.shinglesSql(3)},
      |shd AS (SELECT DISTINCT doc_id, sg FROM sh),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id),
      |sig AS (
      |  SELECT doc_id, b,
      |    MIN(md5(CAST(b AS VARCHAR) || '|' || sg)) AS sig
      |  FROM sh CROSS JOIN
      |    (SELECT unnest(generate_series(0, ${Bands - 1})) AS b) bands
      |  GROUP BY doc_id, b),
      |cand AS (SELECT DISTINCT s1.doc_id AS d1, s2.doc_id AS d2
      |  FROM sig s1 JOIN sig s2
      |    ON s1.b = s2.b AND s1.sig = s2.sig AND s1.doc_id < s2.doc_id),
      |inter AS (SELECT c.d1, c.d2, COUNT(*) AS n_inter
      |  FROM cand c
      |  JOIN shd a ON c.d1 = a.doc_id
      |  JOIN shd b ON c.d2 = b.doc_id AND a.sg = b.sg
      |  GROUP BY c.d1, c.d2)
      |SELECT i.d1, i.d2, i.n_inter, za.n AS n_a, zb.n AS n_b,
      |  CAST(i.n_inter AS DOUBLE) / (za.n + zb.n - i.n_inter) AS jaccard
      |FROM inter i
      |JOIN sizes za ON i.d1 = za.doc_id
      |JOIN sizes zb ON i.d2 = zb.doc_id
      |WHERE CAST(i.n_inter AS DOUBLE) / (za.n + zb.n - i.n_inter) >= 0.2
      |""".stripMargin))

  // -------------------------------------------------------------- dd05
  /** Embedding-cosine near-dup pairs (threshold 0.4). Brute-force
    * baseline on the bounded embeddings table; [[Similarity.ann02]]
    * is the bucketed scale path. Fold-order-identical math => exact
    * double equality with the oracle. */
  private val dd05 = QueryDef(
    "dd05_embed_dup",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.toDouble("embedding").as("v"))
        .withColumn("nn", VectorOps.norm2("v"))
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
          VectorOps.cosine("a.v", "b.v", "a.nn", "b.nn").as("cos"))
        .filter(col("cos") >= 0.4)
    },
    Some(s"""WITH e AS (SELECT vec_id,
      |  ${VectorOps.castSql("embedding")} AS v FROM embeddings),
      |n AS (SELECT vec_id, v, ${VectorOps.dotSql("v", "v")} AS nn FROM e)
      |SELECT a.vec_id AS v1, b.vec_id AS v2,
      |  ${VectorOps.cosineSql("a.v", "b.v", "a.nn", "b.nn")} AS cos
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |WHERE ${VectorOps.cosineSql("a.v", "b.v", "a.nn", "b.nn")} >= 0.4
      |""".stripMargin))

  val defs: Seq[QueryDef] = Seq(dd01, dd02, dd03, dd04, dd05)
}
