package graft.streaming

import graft.functions.MinHashSigs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Dedup-on-ingest: near-duplicate detection for a CONTINUOUS document
  * stream against an existing corpus — the shape a training-data
  * pipeline actually runs day 2 (the corpus is already deduped; new
  * crawl batches arrive forever and each doc must be checked as it
  * lands, not in a nightly O(corpus²) rebuild).
  *
  * Spark-first decomposition:
  *  - the corpus collapses ONCE into a static LSH band index
  *    ((band, sig) → distinct), built with the same native
  *    [[MinHashSigs]] expression the batch dedup (dd02) uses — one
  *    codegen'd call per doc, no shingle explode;
  *  - the stream side computes its signatures the same way, explodes
  *    only bands-per-doc rows (bounded fan-out, never shingles), and
  *    probes the index with a STREAM-STATIC left-semi join — no state,
  *    no watermark needed for the join itself (the static side is a
  *    bounded build relation; at 100 TB it is a bucketed parquet table
  *    and the probe is an ordinary shuffle-hash join per micro-batch);
  *  - band hits collapse back to one row per doc with
  *    `dropDuplicatesWithinWatermark` — event-time-bounded state, the
  *    only stateful operator in the query.
  *
  * False positives are the LSH kind (a band collision without real
  * overlap); the batch pipeline's verify pass (dd04) applies downstream
  * on the flagged stream if exactness is needed.
  */
object IngestDedup {

  /** Shingle size / band count — dd02's batch parameters BY
    * REFERENCE (ADVICE r9: the equality used to hold only by
    * convention; now a change to either constant reaches both the
    * batch and streaming paths or neither). */
  val ShingleK: Int = graft.pipelines.Dedup.ShingleK
  val Bands: Int = graft.pipelines.Dedup.Bands

  private def sigs(ws: Column): Column =
    column(MinHashSigs(expression(ws), ShingleK, Bands))

  private def tokenized(docs: DataFrame): DataFrame =
    docs.withColumn("ws",
      expr("filter(split(text, '\\\\s+'), x -> x <> '')"))

  /** Static corpus → LSH band index (band, sig), distinct. Build once,
    * persist (bucket by (band, sig) at scale) and reuse per batch. */
  def corpusIndex(corpus: DataFrame): DataFrame =
    tokenized(corpus)
      .select(posexplode(sigs(col("ws"))).as(Seq("band", "sig")))
      .distinct()

  /** Streaming docs (doc_id, text, ts) → the near-duplicate subset
    * (doc_id, ts), one row per flagged doc. `index` is a static
    * [[corpusIndex]] result; `watermark` bounds the per-doc collapse
    * state (docs older than it may re-emit, never silently drop). */
  def flagNearDuplicates(
      docs: DataFrame,
      index: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    tokenized(docs)
      .select(col("doc_id"), col("ts"),
        posexplode(sigs(col("ws"))).as(Seq("band", "sig")))
      .join(index, Seq("band", "sig"), "left_semi")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("doc_id")
      .select(col("doc_id"), col("ts"))

  /** Corpus → the dd12 Bloom seen-set bitmap, collected to the driver
    * (one row of bits/64 longs — 8 KB at the default size,
    * corpus-size-independent, the whole point; size `bits` to the
    * corpus fp budget per [[graft.functions.BloomBitsAgg]]'s sizing
    * math). Build once beside [[corpusIndex]]; at scale, rebuild on
    * corpus compaction. */
  def corpusBloom(corpus: DataFrame,
      bits: Long = graft.functions.BloomBitsAgg.DefaultBits): Array[Long] =
    corpus
      .select(expr(graft.OracleSafe.hash60("text")).as("h"))
      .agg(column(graft.functions.BloomBitsAgg(expression(col("h")), bits)
        .toAggregateExpression()).as("bloom"))
      .collect()(0).getSeq[Long](0).toArray

  /** EXACT-duplicate admission gate — the cheap filter in FRONT of the
    * LSH probe: each arriving doc tests its content fingerprint's k
    * bits against the broadcast bitmap with codegen'd integer ops — a
    * narrow per-batch projection, no join, no state, no watermark.
    * `maybe_seen = false` is DEFINITIVE (Bloom filters never false-
    * negative): those docs are certainly novel content and can skip
    * the exact-hash lookup a pipeline would otherwise pay per doc;
    * `maybe_seen = true` routes to exact verification (and near-dup
    * flagging catches the rest). Works identically on batch and
    * streaming frames. */
  def withAdmissionFlag(docs: DataFrame, bloom: Array[Long]): DataFrame = {
    // probe math comes from the single definition beside the build
    // aggregate — see BloomBitsAgg.probeHitExpr; the bitmap row itself
    // carries its size (64 bits per word)
    val hit = graft.functions.BloomBitsAgg.probeHitExpr(
      "bloomw", bits = bloom.length * 64L)
    docs
      .withColumn("h", expr(graft.OracleSafe.hash60("text")))
      .withColumn("bloomw", typedlit(bloom.toSeq))
      .withColumn("maybe_seen", expr(hit))
      .drop("h", "bloomw")
  }

  /** Corpus → a SHINGLE-level Bloom seen-set: the distinct 3-shingle
    * hashes of the whole corpus folded into one bitmap — dd07's
    * decontamination index with the exact broadcast list swapped for
    * a corpus-size-independent sketch (the exact list is the MB-scale
    * tool; a web-corpus shingle set is billions of keys). Built in
    * one pass: codegen'd per-doc distinct-shingle call, explode to
    * hash rows, OR-merge aggregate; `bits` per the BloomBitsAgg
    * sizing math. */
  def corpusShingleBloom(corpus: DataFrame, bits: Long): Array[Long] =
    tokenized(corpus)
      .select(explode(column(graft.functions.ShingleHashSet(
        expression(col("ws")), ShingleK))).as("h"))
      .agg(column(graft.functions.BloomBitsAgg(expression(col("h")), bits)
        .toAggregateExpression()).as("bloom"))
      .collect()(0).getSeq[Long](0).toArray

  /** Per-doc shingle-overlap against a [[corpusShingleBloom]] bitmap —
    * the approximate CONTAMINATION gate on ingest: n_maybe_seen of
    * n_shingles distinct shingles probe true (no false negatives, so
    * low overlap is definitive novelty; fp is the sized budget). A
    * stateless codegen'd projection — the k-bit tests run inside an
    * array lambda against the broadcast bitmap literal; no join, no
    * state, batch and streaming frames alike. */
  def withShingleOverlap(
      docs: DataFrame, bloom: Array[Long], bits: Long): DataFrame = {
    val hit = graft.functions.BloomBitsAgg.probeHitExpr("bloomw", "x", bits)
    tokenized(docs)
      .withColumn("hset", column(graft.functions.ShingleHashSet(
        expression(col("ws")), ShingleK)))
      .withColumn("bloomw", typedlit(bloom.toSeq))
      .withColumn("n_shingles", size(col("hset")).cast("long"))
      .withColumn("n_maybe_seen",
        size(expr(s"filter(hset, x -> $hit)")).cast("long"))
      .drop("ws", "hset", "bloomw")
  }

  /** The §2.2 ↔ §2.3 integration: a `graft-cdc` SUBSCRIPTION of a
    * documents table, checked for near-dups as records arrive. The
    * reference's domain (CDC transport of table changes) feeds the
    * training-pipeline domain (corpus dedup) in one streaming query:
    * per-table selection pushes into the chunk reader (non-matching
    * tables never decode their record tail), INSERT/UPDATE
    * after-images project to typed columns via [[graft.cdc.TypedSchema]]
    * (the declared schema must carry `doc_id` and `text`), commit time
    * becomes the event time, and the LSH probe runs as above. */
  def fromCdcSubscription(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      schema: graft.cdc.TypedSchema.TableSchema,
      index: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    // selector built via ObjectNames.compress: a db or table whose
    // NAME contains a dot must travel escaped, or the strict
    // two-segment parse (CdcSource.parseTableSelector) rejects it
    val changes = CdcStreaming
      .readStream(spark, path, table = Some(
        graft.cdc.ObjectNames.compress(Seq(schema.db, schema.tbl))))
      .filter(col("op").isin(graft.cdc.Op.Insert, graft.cdc.Op.Update))
    val docs = graft.cdc.TypedSchema.project(changes, schema)
      .select(col("doc_id"),
        timestamp_micros(col("record_ts_us")).as("ts"), col("text"))
    flagNearDuplicates(docs, index, watermark)
  }
}
