package graft.sources

import graft.cdc.RecordCodec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util

/** `graft-cdc`: a DataSourceV2 micro-batch + batch source over
  * [[CdcChunkFile]] segment directories — the Spark-native
  * re-expression of the reference's subscription consumer (ref:
  * FlinkDtsRawConsumer.java + internal/DtsKafkaFetcher.java).
  *
  * Where the reference hand-rolls a Kafka fetch thread, per-partition
  * offset state and checkpoint hooks, here Spark owns the loop:
  * offsets are chunk counts tracked by Structured Streaming's
  * checkpointing (exactly-once), admission control is
  * `maxChunksPerTrigger`, and the Dstore-failover "re-seek by
  * timestamp" path (ref: fetcher/ClusterSwitchListener.java
  * searchOffsetByTimestamp) is `startingTimestampUs`, which prunes
  * whole chunks via their stats footer before any record is read.
  *
  * Options:
  *   - `path` (required): chunk directory
  *   - `startingTimestampUs`: drop records strictly older; skip whole
  *     chunks whose footer maxTs is older
  *   - `maxChunksPerTrigger`: admission cap per micro-batch
  *   - `table`: single-table selection as `db.tbl` (ref:
  *     DTSSubscribeTableSourceFactory.java `table.name`); non-matching
  *     records are dropped on the cheap prefix read — their tail
  *     (pkNames/before/after) is never parsed
  *   - `mode`: `failfast` (default) aborts on a corrupt record;
  *     `permissive` skips it and counts it (ref: the reference wraps
  *     per-record handling in SwallowException.java) — a torn byte
  *     must not take down a long-running subscription
  */
class CdcSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    // `versionAsOf` flips the provider into SNAPSHOT mode: the path is
    // a CdcParquetSink table dir and the read serves the pinned
    // version's merged state (VERDICT r10 #7 — time travel on the
    // declarative surface, Delta's reader-option shape), with the
    // store's row schema instead of the chunk transport's
    if (options.containsKey("versionAsOf"))
      graft.sinks.CdcParquetSink.StoreSchema
    else CdcSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    if (properties.containsKey("versionAsOf"))
      new CdcSnapshotTable(CdcSource.normalizePath(properties.get("path")),
        properties.get("versionAsOf").toLong)
    else
      new CdcTable(CdcSource.normalizePath(properties.get("path")),
        Option(properties.get("startingTimestampUs")).map(_.toLong),
        Option(properties.get("maxChunksPerTrigger")).map(_.toInt),
        Option(properties.get("table")).map(CdcSource.parseTableSelector),
        CdcSource.parseMode(properties.get("mode")))
}

/** Pushed-down header predicates (conjunctive): exact op/db/tbl
  * equality + a tsUs interval. Evaluated on the record header/prefix
  * before any tail parse; the tsUs interval additionally prunes whole
  * chunks by footer stats. */
case class HeaderFilters(
    op: Option[String] = None,
    db: Option[String] = None,
    tbl: Option[String] = None,
    tsMinUs: Option[Long] = None,
    tsMaxUs: Option[Long] = None) {
  def withTsMin(v: Long): HeaderFilters =
    copy(tsMinUs = Some(tsMinUs.fold(v)(math.max(_, v))))
  def withTsMax(v: Long): HeaderFilters =
    copy(tsMaxUs = Some(tsMaxUs.fold(v)(math.min(_, v))))
  def isEmpty: Boolean =
    op.isEmpty && db.isEmpty && tbl.isEmpty &&
      tsMinUs.isEmpty && tsMaxUs.isEmpty
}

object CdcSource {
  /** Compressed `db.tbl` selector → (db, tbl). Segments containing
    * dots travel in [[graft.cdc.ObjectNames]]'s escaped form (the
    * reference's ObjectNameUtils contract), so a database or table
    * whose NAME contains a dot resolves correctly instead of
    * splitting at the wrong boundary — build selectors with
    * `ObjectNames.compress(Seq(db, tbl))`. */
  def parseTableSelector(s: String): (String, String) = {
    val parts = graft.cdc.ObjectNames.uncompress(s)
    require(parts != null && parts.length == 2 &&
      parts.forall(p => p != null && p.nonEmpty),
      s"graft-cdc 'table' must be 'db.tbl' (dots inside a name " +
        s"escaped per ObjectNames.compress), got '$s'")
    (parts(0), parts(1))
  }

  /** The session catalog rewrites a `path` option into a location URI
    * (`file:/dir`) before handing it to the provider — `CREATE TABLE
    * ... USING graft-cdc OPTIONS (path ...)` would otherwise scan a
    * literal "file:/dir" directory and read nothing. Local URIs fold
    * back to plain paths; non-file schemes and plain paths pass
    * through. */
  def normalizePath(p: String): String =
    if (p != null && p.startsWith("file:"))
      java.nio.file.Paths.get(java.net.URI.create(p)).toString
    else p

  /** `mode` option → permissive flag; null/absent = failfast. */
  def parseMode(s: String): Boolean = s match {
    case null | "failfast" => false
    case "permissive"      => true
    case other => throw new IllegalArgumentException(
      s"graft-cdc 'mode' must be failfast|permissive, got '$other'")
  }

  /** Count of corrupt records skipped by permissive readers in this
    * JVM (observable in specs and ops dashboards; monotone). */
  val corruptSkipped = new java.util.concurrent.atomic.AtomicLong(0L)

  /** One FK constraint as SQL: parent coordinates + aligned
    * parent/child column lists (ref ForeignKeyIndexInfo.java). */
  val fkParentType: StructType = StructType(Seq(
    StructField("parentSchema", StringType),
    StructField("parentDb", StringType),
    StructField("parentTbl", StringType),
    StructField("parentCols", ArrayType(StringType)),
    StructField("childCols", ArrayType(StringType))))

  /** Output schema == [[graft.cdc.ChangeRecord]]. */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("transactionId", StringType),
    StructField("tsUs", LongType, nullable = false),
    StructField("bornUs", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("db", StringType),
    StructField("tbl", StringType),
    StructField("pkNames", ArrayType(StringType)),
    StructField("before", MapType(StringType, StringType)),
    StructField("after", MapType(StringType, StringType)),
    StructField("props", MapType(StringType, StringType)),
    StructField("sourceType", StringType),
    StructField("sourceVersion", StringType),
    StructField("ukNames", ArrayType(StringType)),
    StructField("transSeq", LongType, nullable = false),
    StructField("fkParents", ArrayType(fkParentType))))

  /** Writable column layouts: the full v4 shape, or the legacy v3
    * 14-column prefix (a relay built against the older transport) —
    * missing trailing fields encode as their absent sentinels, the
    * same evolution rule the codec's version byte gives readers. */
  val writableArities: Set[Int] = Set(schema.length, 14)
}

class CdcTable(
    path: String,
    startTsUs: Option[Long],
    maxChunksPerTrigger: Option[Int],
    tableSel: Option[(String, String)] = None,
    permissive: Boolean = false)
  extends Table with SupportsRead with SupportsWrite {

  require(path != null, "graft-cdc requires a 'path' option")
  override def name(): String = s"graft-cdc:$path"
  override def schema(): StructType = CdcSource.schema
  override def capabilities(): util.Set[TableCapability] =
    // ACCEPT_ANY_SCHEMA: writers ship the v4 16-column shape OR the
    // legacy 14-column prefix (schema evolution at the sink); the
    // write builder validates the prefix itself — without this the
    // analyzer would demand every table column (transSeq is
    // non-nullable) from legacy relays
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
      with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
      // Catalyst column pruning lands here; the pruned schema reaches
      // the binary decoder, which then skips unneeded tail sections
      private var required: StructType = CdcSource.schema
      private var pushed: Array[Filter] = Array.empty
      private var hdr: HeaderFilters = HeaderFilters()

      override def pruneColumns(requiredSchema: StructType): Unit =
        // top-level pruning only: Catalyst may also prune NESTED
        // fields (fkParents struct narrowed to the one field a query
        // touches), but the decoder emits full wire structs — serving
        // them under a narrowed schema would misalign field ordinals
        // (parentTbl read from the parentSchema slot). Re-widen each
        // kept column to its full source type.
        required = StructType(
          requiredSchema.fieldNames.map(n => CdcSource.schema(n)))

      // header-field predicates evaluate EXACTLY on the fixed header /
      // prefix (op: one byte; db/tbl: prefix read; tsUs: header long +
      // whole-chunk footer pruning) — accepted filters are fully
      // handled, everything else stays with Spark
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        val (accept, reject) = filters.partition {
          case EqualTo("op", _: String)  => true
          case EqualTo("db", _: String)  => true
          case EqualTo("tbl", _: String) => true
          case GreaterThanOrEqual("tsUs", _: java.lang.Long) => true
          case GreaterThan("tsUs", _: java.lang.Long)        => true
          case LessThanOrEqual("tsUs", _: java.lang.Long)    => true
          case LessThan("tsUs", _: java.lang.Long)           => true
          case _ => false
        }
        accept.foreach {
          case EqualTo("op", v: String)  => hdr = hdr.copy(op = Some(v))
          case EqualTo("db", v: String)  => hdr = hdr.copy(db = Some(v))
          case EqualTo("tbl", v: String) => hdr = hdr.copy(tbl = Some(v))
          case GreaterThanOrEqual("tsUs", v: java.lang.Long) =>
            hdr = hdr.withTsMin(v)
          case GreaterThan("tsUs", v: java.lang.Long) =>
            hdr = hdr.withTsMin(v + 1L)
          case LessThanOrEqual("tsUs", v: java.lang.Long) =>
            hdr = hdr.withTsMax(v)
          case LessThan("tsUs", v: java.lang.Long) =>
            hdr = hdr.withTsMax(v - 1L)
          case _ => ()
        }
        pushed = accept
        reject
      }
      override def pushedFilters(): Array[Filter] = pushed

      override def build(): Scan =
        new CdcScan(path, startTsUs, maxChunksPerTrigger, tableSel,
          permissive, required, hdr)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // ACCEPT_ANY_SCHEMA skips the analyzer's output resolution, so the
    // builder owns validation: names AND types of the written prefix
    // (a mistyped column would otherwise surface as a task-time cast
    // failure deep in the encode path)
    val got = info.schema().fields
    require(CdcSource.writableArities.contains(got.length) &&
      got.map(_.name).sameElements(
        CdcSource.schema.fieldNames.take(got.length)),
      s"graft-cdc write schema must be a ${CdcSource.writableArities}-column " +
        s"prefix of ${CdcSource.schema.fieldNames.mkString(",")}, " +
        s"got ${got.map(_.name).mkString(",")}")
    got.zip(CdcSource.schema.fields).foreach { case (g, e) =>
      // catalogString comparison: nullability-blind (writers
      // legitimately produce non-null literals for nullable columns)
      require(g.dataType.catalogString == e.dataType.catalogString,
        s"graft-cdc write column '${g.name}' must be " +
          s"${e.dataType.catalogString}, got ${g.dataType.catalogString}")
    }
    new CdcWriteBuilder(path)
  }
}

/** DSv2 custom metrics: the scan's pruning work, visible per query in
  * the SQL UI / QueryExecution metrics — at 100 TB "how much did the
  * source NOT read" is the number an operator actually watches.
  *   - chunksPruned: whole segments skipped by footer stats (driver)
  *   - recordsSkippedHeader: records dropped on the fixed-header /
  *     prefix read, tail never parsed (pushdown + table selection)
  *   - recordsDecoded: records fully decoded to rows
  *   - recordsCorruptSkipped: permissive-mode skips
  */
private[sources] object CdcMetrics {
  final class ChunksPruned extends CustomSumMetric {
    override def name(): String = "chunksPruned"
    override def description(): String =
      "chunks skipped whole by footer stats"
  }
  final class RecordsSkippedHeader extends CustomSumMetric {
    override def name(): String = "recordsSkippedHeader"
    override def description(): String =
      "records dropped on header/prefix read (tail never parsed)"
  }
  final class RecordsDecoded extends CustomSumMetric {
    override def name(): String = "recordsDecoded"
    override def description(): String = "records fully decoded to rows"
  }
  final class RecordsCorruptSkipped extends CustomSumMetric {
    override def name(): String = "recordsCorruptSkipped"
    override def description(): String = "corrupt records skipped (permissive)"
  }
  def all: Array[CustomMetric] = Array(
    new ChunksPruned, new RecordsSkippedHeader, new RecordsDecoded,
    new RecordsCorruptSkipped)

  final case class Value(metricName: String, metricValue: Long)
    extends CustomTaskMetric {
    override def name(): String = metricName
    override def value(): Long = metricValue
  }
}

/** Offset = number of chunks fully consumed (chunk list is sorted and
  * append-only, like Kafka segment offsets). */
case class CdcOffset(chunksConsumed: Int) extends Offset {
  override def json(): String = s"""{"chunksConsumed":$chunksConsumed}"""
}

object CdcOffset {
  private val Re = """\{"chunksConsumed":(\d+)\}""".r
  def fromJson(j: String): CdcOffset = j match {
    case Re(n) => CdcOffset(n.toInt)
    case other => throw new IllegalArgumentException(s"bad cdc offset: $other")
  }
}

class CdcScan(
    path: String,
    startTsUs: Option[Long],
    maxChunksPerTrigger: Option[Int],
    tableSel: Option[(String, String)] = None,
    permissive: Boolean = false,
    required: StructType = CdcSource.schema,
    hdrFilters: HeaderFilters = HeaderFilters())
  extends Scan with SupportsReportStatistics {

  override def readSchema(): StructType = required

  private val chunksPruned = new java.util.concurrent.atomic.AtomicLong(0L)

  override def supportedCustomMetrics(): Array[CustomMetric] = CdcMetrics.all

  override def reportDriverMetrics(): Array[CustomTaskMetric] =
    Array(CdcMetrics.Value("chunksPruned", chunksPruned.get))

  /** Make the pushdown visible in explain output (PlanAudit greps
    * for PushedFilters the way it does on parquet scans). */
  override def description(): String = {
    val fs = Seq(
      hdrFilters.op.map(o => s"op=$o"),
      hdrFilters.db.map(d => s"db=$d"),
      hdrFilters.tbl.map(t => s"tbl=$t"),
      hdrFilters.tsMinUs.map(v => s"tsUs>=$v"),
      hdrFilters.tsMaxUs.map(v => s"tsUs<=$v")).flatten
    s"graft-cdc PushedFilters: [${fs.mkString(", ")}], " +
      s"table=${tableSel.fold("*") { case (d, t) => s"$d.$t" }}"
  }

  /** Source-schema ordinal of each required column. */
  private def ordinals: Array[Int] =
    required.fieldNames.map(CdcSource.schema.fieldIndex)

  /** Footer-exact statistics (row count) + file-size bytes, so
    * Catalyst can pick a broadcast join when the subscription is the
    * small side of a dim-lookup (the reference's join test shape) —
    * without stats a DSv2 source defaults to "huge" and the planner
    * shuffles both sides. */
  override def estimateStatistics(): Statistics = {
    val chunks = CdcChunkFile.listChunks(path)
    var rows = 0L
    var bytes = 0L
    chunks.foreach { c =>
      val f = CdcChunkFile.readFooter(c)
      if (!startTsUs.exists(ts => f.maxTsUs < ts)) {
        rows += f.nRecords
        bytes += java.nio.file.Files.size(java.nio.file.Paths.get(c))
      }
    }
    val r = rows; val b = bytes
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(b)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(r)
    }
  }

  // planned once per scan: Spark may ask for the partitions more than
  // once per execution — caching keeps the listing + footer reads (and
  // the chunksPruned metric) single-counted
  private lazy val batchParts: Array[InputPartition] =
    planSplits(CdcChunkFile.listChunks(path))

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = batchParts
    override def createReaderFactory(): PartitionReaderFactory =
      new CdcReaderFactory(ordinals)
  }

  /** One footer read per chunk buys timestamp pruning, TABLE pruning
    * AND sub-chunk splitting: indexed chunks yield one input partition
    * per ~SplitStride records, so a single huge segment parallelizes
    * across the cluster instead of serializing onto one core; a chunk
    * whose v3 table directory never mentions the selected/pushed table
    * is skipped whole — a single-table subscription over a many-table
    * transport reads only the chunks that carry its table. */
  private def planSplits(chunks: Seq[String]): Array[InputPartition] =
    chunks.flatMap { c =>
      val f = CdcChunkFile.readFooter(c)
      // any (db,tbl) in the chunk compatible with selector + pushdown?
      def tableMiss = f.tables.exists(!_.exists { case (d, t) =>
        tableSel.forall(_ == ((d, t))) &&
          hdrFilters.db.forall(_ == d) && hdrFilters.tbl.forall(_ == t)
      })
      val pruned =
        startTsUs.exists(ts => f.maxTsUs < ts) ||
        hdrFilters.tsMinUs.exists(f.maxTsUs < _) ||
        hdrFilters.tsMaxUs.exists(f.minTsUs > _) ||
        ((tableSel.isDefined || hdrFilters.db.isDefined ||
          hdrFilters.tbl.isDefined) && tableMiss)
      if (pruned) { chunksPruned.incrementAndGet(); Nil }
      else f.splits.map { case (s0, e0) =>
        CdcInputPartition(c, s0, e0, startTsUs, tableSel, permissive,
          hdrFilters): InputPartition
      }
    }.toArray

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream with SupportsAdmissionControl {
      // chunk listing is re-read per latestOffset call => appended
      // chunks become visible to later triggers
      override def initialOffset(): Offset = CdcOffset(0)
      override def deserializeOffset(json: String): Offset = CdcOffset.fromJson(json)

      override def latestOffset(): Offset =
        CdcOffset(CdcChunkFile.listChunks(path).size)

      // admission control: cap the END offset (not the planned
      // partitions — capping there would silently drop chunks Spark
      // already considers committed)
      override def getDefaultReadLimit: ReadLimit =
        maxChunksPerTrigger.map(n => ReadLimit.maxFiles(n))
          .getOrElse(ReadLimit.allAvailable())
      override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
        val s = start.asInstanceOf[CdcOffset].chunksConsumed
        val n = CdcChunkFile.listChunks(path).size
        limit match {
          case mf: ReadMaxFiles => CdcOffset(math.min(n, s + mf.maxFiles))
          case _                => CdcOffset(n)
        }
      }
      override def reportLatestOffset(): Offset = latestOffset()

      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
        val s = start.asInstanceOf[CdcOffset].chunksConsumed
        val e = end.asInstanceOf[CdcOffset].chunksConsumed
        planSplits(CdcChunkFile.listChunks(path).slice(s, e))
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new CdcReaderFactory(ordinals)
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
    }
}

case class CdcInputPartition(
    chunkPath: String,
    startOff: Long,
    endOff: Long,
    startTsUs: Option[Long],
    tableSel: Option[(String, String)],
    permissive: Boolean = false,
    hdrFilters: HeaderFilters = HeaderFilters())
  extends InputPartition

class CdcReaderFactory(ordinals: Array[Int]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcInputPartition]
    new CdcPartitionReader(p.chunkPath, p.startOff, p.endOff, p.startTsUs,
      p.tableSel, p.permissive, ordinals, p.hdrFilters)
  }
}

/** Decodes one chunk. Records older than the reposition timestamp or
  * outside the selected table are dropped on LAZY prefix reads — the
  * record tail (pkNames/before/after) is never parsed for skipped
  * records. Kept records decode DIRECTLY to InternalRow
  * ([[RecordCodec.decodeProjected]]: UTF8String slices over the
  * record bytes, no String materialization, no map re-sort, unneeded
  * sections skipped) — the reference's direct-from-bytes fast path
  * combined with Catalyst column pruning. */
class CdcPartitionReader(
    chunkPath: String,
    startOff: Long,
    endOff: Long,
    startTsUs: Option[Long],
    tableSel: Option[(String, String)] = None,
    permissive: Boolean = false,
    ordinals: Array[Int] = (0 until CdcSource.schema.length).toArray,
    hdrFilters: HeaderFilters = HeaderFilters())
  extends PartitionReader[InternalRow] {

  // -1 = no op filter; -2 = pushed op outside the vocabulary, which
  // can never match a decoded record (decode maps junk to UNKNOWN)
  private val opCodeWanted: Int = hdrFilters.op match {
    case None => -1
    case Some(o) if graft.cdc.Op.all.contains(o) => graft.cdc.Op.code(o).toInt
    case Some(_) => -2
  }

  private val projection = new RecordCodec.RowProjection(ordinals)
  private val raw =
    CdcChunkFile.readRawRecordsRange(chunkPath, startOff, endOff)
  private var current: InternalRow = _
  private var nSkipped = 0L
  private var nDecoded = 0L
  private var nCorrupt = 0L

  override def next(): Boolean = {
    while (raw.hasNext) {
      val bytes = raw.next()
      try {
        val keep = headerKeep(bytes) &&
          tableSel.forall(RecordCodec.headerTable(bytes) == _) &&
          dbTblKeep(bytes)
        if (keep) {
          current = toRow(bytes)
          nDecoded += 1
          return true
        } else nSkipped += 1
      } catch {
        // framing is intact (length prefixes), only this payload is
        // bad — skip and count rather than kill the subscription
        case e: Exception if permissive =>
          nCorrupt += 1
          CdcSource.corruptSkipped.incrementAndGet()
      }
    }
    false
  }

  override def get(): InternalRow = current
  // the range iterator owns a file handle; Spark may stop consuming
  // early (limit pushdown), so release it here rather than at GC
  override def close(): Unit = raw.close()

  override def currentMetricsValues(): Array[CustomTaskMetric] = Array(
    CdcMetrics.Value("recordsSkippedHeader", nSkipped),
    CdcMetrics.Value("recordsDecoded", nDecoded),
    CdcMetrics.Value("recordsCorruptSkipped", nCorrupt))

  /** Fixed-header checks: ts bounds + op byte — no parsing at all. */
  private def headerKeep(bytes: Array[Byte]): Boolean = {
    val ts = RecordCodec.headerTsUs(bytes)
    startTsUs.forall(ts >= _) &&
      hdrFilters.tsMinUs.forall(ts >= _) &&
      hdrFilters.tsMaxUs.forall(ts <= _) &&
      (opCodeWanted == -1 || RecordCodec.headerOpCode(bytes) == opCodeWanted)
  }

  /** Prefix checks for pushed db/tbl equality (tail never parsed). */
  private def dbTblKeep(bytes: Array[Byte]): Boolean = {
    if (hdrFilters.db.isEmpty && hdrFilters.tbl.isEmpty) true
    else {
      val (db, tbl) = RecordCodec.headerTable(bytes)
      hdrFilters.db.forall(_ == db) && hdrFilters.tbl.forall(_ == tbl)
    }
  }

  private def toRow(bytes: Array[Byte]): InternalRow =
    RecordCodec.decodeProjected(bytes, projection)
}
