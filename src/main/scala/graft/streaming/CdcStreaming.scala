package graft.streaming

import graft.cdc.Op
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming pipelines over the `graft-cdc` source — the reference's
  * consumer-side behaviors re-expressed on Structured Streaming:
  * Flink's checkpointed source state (ref: FlinkDtsConsumer.java)
  * becomes Spark checkpointing; its watermarked event-time SQL (ref:
  * DtsTableISelectTCaseTest.java `WATERMARK FOR ts AS ts - INTERVAL
  * '5' SECOND`) becomes withWatermark + window; changelog upsert
  * becomes flatMapGroupsWithState.
  */
object CdcStreaming {

  /** Open the subscription as an unbounded DataFrame. */
  def readStream(
      spark: SparkSession,
      path: String,
      startingTimestampUs: Option[Long] = None,
      maxChunksPerTrigger: Option[Int] = None,
      table: Option[String] = None): DataFrame = {
    var r = spark.readStream.format("graft-cdc").option("path", path)
    startingTimestampUs.foreach(ts => r = r.option("startingTimestampUs", ts))
    maxChunksPerTrigger.foreach(n => r = r.option("maxChunksPerTrigger", n))
    table.foreach(t => r = r.option("table", t))
    r.load()
  }

  /** Batch view of the same chunks (shared scan code path). */
  def readBatch(
      spark: SparkSession,
      path: String,
      startingTimestampUs: Option[Long] = None,
      table: Option[String] = None): DataFrame = {
    var r = spark.read.format("graft-cdc").option("path", path)
    startingTimestampUs.foreach(ts => r = r.option("startingTimestampUs", ts))
    table.foreach(t => r = r.option("table", t))
    r.load()
  }

  /** Decode a Kafka-shaped frame — any batch or streaming DataFrame
    * with a binary `value` column, e.g.
    * `spark.readStream.format("kafka").options(sub.toKafkaOptions)
    * .load()` — into the subscription's typed
    * [[graft.cdc.ChangeRecord]] columns, the exact schema the
    * `graft-cdc` file source emits. The wire-side half of
    * [[graft.sources.CdcSubscription.toKafkaOptions]]: the option map
    * gets the stream to the broker, this turns its payloads into the
    * engine's records, so every downstream pipeline (materializers,
    * windows, IngestDedup, CdcParquetSink) runs unchanged against a
    * live endpoint (ref: the DtsKafkaFetcher → deserializer topology,
    * DtsKafkaConsumerThread.java / LazyRecordDeserializer.java).
    *
    * `table` applies the same `db.tbl` selection the file source
    * pushes into its reader; with no chunk footer on the wire, it
    * becomes a per-record PREFIX check — `headerTable` reads only the
    * fixed header + (db,tbl) prefix, so skipped tables still never
    * parse their row-image tail (the reference's lazy-parse claim on
    * the Kafka path). Undecodable payloads are dropped under
    * `permissive` (the source's corrupt-record mode), rethrown
    * otherwise.
    *
    * `wire` selects the payload format: "graft" (default) is the
    * engine's own [[graft.cdc.RecordCodec]]; "dts-avro" decodes the
    * REAL subscription layout — the public DTS Avro record the
    * reference lazily parses ([[graft.cdc.AvroWire]], ref
    * LazyRecordDeserializer.java) — so pointing `toKafkaOptions` at a
    * genuine subscription endpoint yields the same typed columns.
    * Both formats keep the prefix-only claim: table selection reads
    * the header, never the row-image tail. */
  def fromKafkaRecords(
      kafka: DataFrame,
      table: Option[String] = None,
      permissive: Boolean = true,
      wire: String = "graft"): DataFrame = {
    val spark = kafka.sparkSession
    import spark.implicits._
    val sel = table.map(graft.sources.CdcSource.parseTableSelector)
    val (headerTableOf, decodeOf) = wireCodec(wire)
    kafka.select(col("value")).as[Array[Byte]]
      .flatMap { bytes =>
        // null values are log-compaction tombstones (key-only deletion
        // markers), not corrupt payloads: dropped in BOTH modes —
        // strict mode must not kill the stream on routine compaction
        if (bytes == null) None
        else try {
          if (!sel.forall(headerTableOf(bytes) == _)) None
          else Some(decodeOf(bytes))
        } catch {
          case e: Exception => if (permissive) None else throw e
        }
      }
      .toDF()
  }

  private def wireCodec(wire: String)
      : (Array[Byte] => (String, String), Array[Byte] => graft.cdc.ChangeRecord) =
    wire match {
      case "graft" =>
        ((b: Array[Byte]) => graft.cdc.RecordCodec.headerTable(b),
          (b: Array[Byte]) => graft.cdc.RecordCodec.decode(b))
      case "dts-avro" =>
        ((b: Array[Byte]) => graft.cdc.AvroWire.headerTable(b),
          (b: Array[Byte]) => graft.cdc.AvroWire.decode(b))
      case other => throw new IllegalArgumentException(
        s"fromKafkaRecords wire must be graft|dts-avro, got '$other'")
    }

  /** [[fromKafkaRecords]] CARRYING the transport's metadata columns —
    * the COMPLETE readable-metadata surface of the reference table
    * source (ref: DtsDynamicSource.java:268-345 ReadableMetadata, ALL
    * SIX entries: topic/partition/headers/offset/timestamp/
    * timestamp-type appended after the physical row). Same
    * selection/strict/tombstone contract; output = the full
    * [[graft.cdc.ChangeRecord]] schema plus `kafka_topic`/
    * `kafka_partition`/`kafka_offset`/`kafka_timestamp_ms`/
    * `kafka_headers`/`kafka_timestamp_type` appended at the end,
    * prefixed so record columns can never collide.
    *
    *  - `kafka_headers` is `map<string,binary>` — the reference's
    *    HEADERS converter flattens the record's ordered header list
    *    into a map with a last-wins put loop
    *    (DtsDynamicSource.java:294-307), mirrored exactly here. A
    *    frame with no `headers` column (the real source without
    *    `includeHeaders=true`) carries NULL.
    *  - `kafka_timestamp_type` is the Kafka enum's display name
    *    (`CreateTime`/`LogAppendTime`/`NoTimestampType`) — the
    *    reference renders `record.timestampType().toString`
    *    (DtsDynamicSource.java:336-344). A frame with no
    *    `timestampType` column reports `NoTimestampType`.
    *
    * A consumer uses them for provenance (routing tags ride headers),
    * offset-based audit and time semantics — exactly why the
    * reference exposes them as queryable metadata. Stateless per-row
    * map riding the scan, like the metadata-free form. */
  def fromKafkaRecordsWithMeta(
      kafka: DataFrame,
      table: Option[String] = None,
      permissive: Boolean = true,
      wire: String = "graft"): DataFrame = {
    val spark = kafka.sparkSession
    import spark.implicits._
    val sel = table.map(graft.sources.CdcSource.parseTableSelector)
    val (headerTableOf, decodeOf) = wireCodec(wire)
    val headersCol =
      if (kafka.columns.contains("headers"))
        transform(col("headers"), h =>
          struct(h.getField("key").as("_1"), h.getField("value").as("_2")))
      else lit(null).cast("array<struct<_1:string,_2:binary>>")
    val tsTypeCol =
      if (kafka.columns.contains("timestampType"))
        col("timestampType").cast("int")
      else lit(-1)
    kafka.select(col("topic"), col("partition").cast("int"),
        col("offset").cast("long"),
        unix_millis(col("timestamp")).as("ts_ms"),
        tsTypeCol.as("ts_type"), headersCol.as("hdrs"), col("value"))
      .as[(String, Int, Long, Long, Int,
        Seq[(String, Array[Byte])], Array[Byte])]
      .flatMap { case (topic, part, off, tsMs, tsType, hdrs, bytes) =>
        if (bytes == null) None
        else try {
          if (!sel.forall(headerTableOf(bytes) == _)) None
          else {
            // last-wins flatten, the reference's header put loop
            val hmap =
              if (hdrs == null) null
              else hdrs.foldLeft(Map.empty[String, Array[Byte]])(_ + _)
            Some((decodeOf(bytes), topic, part, off, tsMs, hmap,
              timestampTypeName(tsType)))
          }
        } catch {
          case e: Exception => if (permissive) None else throw e
        }
      }
      .toDF("r", "kafka_topic", "kafka_partition", "kafka_offset",
        "kafka_timestamp_ms", "kafka_headers", "kafka_timestamp_type")
      .select(col("r.*"), col("kafka_topic"), col("kafka_partition"),
        col("kafka_offset"), col("kafka_timestamp_ms"),
        col("kafka_headers"), col("kafka_timestamp_type"))
  }

  /** Kafka TimestampType code → its display name (the enum's
    * toString: -1 NO_TIMESTAMP_TYPE, 0 CREATE_TIME,
    * 1 LOG_APPEND_TIME). */
  def timestampTypeName(code: Int): String = code match {
    case 0 => "CreateTime"
    case 1 => "LogAppendTime"
    case _ => "NoTimestampType"
  }

  /** Wire decode with DEAD-LETTER ROUTING (round 12): permissive
    * [[fromKafkaRecords]] DROPS undecodable payloads (visible only as
    * a metric); a production ingest routes them to a quarantine
    * table for forensics and replay instead — nothing is silently
    * lost. ONE stateless pass over (wire_id, value): a payload either
    * decodes to its record identity (`ok = true`) or lands as a
    * quarantine row carrying the wire offset, payload length and
    * error class. Null payloads remain log-compaction tombstones —
    * dropped, not quarantined (routine compaction is not an error).
    * Stateless per-row map ⇒ identical under batch and streaming,
    * scales with the wire volume, never shuffles. */
  def routeWireRecords(wire: DataFrame): DataFrame = {
    val spark = wire.sparkSession
    import spark.implicits._
    wire.select(col("wire_id").cast("long"), col("value"))
      .as[(Long, Array[Byte])]
      .flatMap { case (wid, bytes) =>
        if (bytes == null) None
        else try {
          val r = graft.cdc.RecordCodec.decode(bytes)
          Some((wid, true, Some(r.id), Some(r.op), Some(r.db),
            Some(r.tbl), bytes.length.toLong, None: Option[String]))
        } catch {
          case e: Exception =>
            Some((wid, false, None: Option[Long], None: Option[String],
              None: Option[String], None: Option[String],
              bytes.length.toLong, Some(e.getClass.getSimpleName)))
        }
      }
      .toDF("wire_id", "ok", "record_id", "op", "db", "tbl",
        "n_bytes", "err_class")
  }

  /** Logical key of a change record: db|tbl|all-pk-values (every
    * declared pk column in pkNames order, '#'-joined) — composite
    * primary keys hash to distinct keys instead of colliding on the
    * first column (ref RecordSchema carries the full pk list). Each
    * pk value comes from whichever image carries it (DELETEs: before;
    * INSERTs: after). Single-column keys produce the same string the
    * round-1 pk1 form did. */
  def keyExpr: org.apache.spark.sql.Column = {
    // pk-less tables key on their first UNIQUE index, the reference's
    // fallback (ref RecordSchema.getUniqueIndexInfo /
    // RowImage.getUniqueKeyValues beside getPrimaryKeyValues): pk
    // columns when declared, else uk columns, else no key suffix
    // (the pre-v3 behavior for records carrying neither)
    val keyCols = when(size(col("pkNames")) > 0, col("pkNames"))
      .otherwise(coalesce(col("ukNames"),
        array().cast("array<string>")))
    concat_ws("|", col("db"), col("tbl"),
      concat_ws("#", transform(keyCols, n =>
        coalesce(element_at(col("after"), n), element_at(col("before"), n)))))
  }

  /** Event-time + watermark advanced by ALL records INCLUDING
    * heartbeats, which are dropped only afterwards — the reference's
    * idle-partition liveness semantics (ref:
    * DtsKafkaTopicPartitionStateWithWatermarkGenerator.java: periodic
    * per-partition watermarks; heartbeat records keep a quiet
    * subscription's event-time moving). Filtering heartbeats BEFORE
    * the watermark stalls every window on an idle table forever;
    * applying the watermark first lets the transport's liveness
    * records close windows with no DML behind them. Downstream:
    * group by `window(col("ts"), ...)` as usual. */
  def withHeartbeatWatermark(
      changes: DataFrame, watermark: String = "10 minutes"): DataFrame =
    changes
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", watermark)
      // the disjunct referencing ts is vacuous (epoch-us timestamps
      // are never pre-1900) but load-bearing: a predicate that doesn't
      // mention the event-time column gets pushed BELOW the
      // EventTimeWatermark node, dropping heartbeats before their
      // timestamps reach the watermark stats — the exact stall this
      // helper exists to avoid. It must also be non-foldable: a plain
      // `ts.isNull` is simplified away (tsUs is non-nullable) and the
      // filter pushes again. CAUTION: any FURTHER downstream filter
      // that ignores `ts` (e.g. `op IN (...)`) will itself push below
      // the watermark and re-starve the stats — use [[guardedFilter]]
      // / [[dmlOnly]] for row filters on a heartbeat-watermarked
      // stream. Fetch-protocol markers (FILL/NOOP/... — ADVICE r14)
      // are the same keepalive family: they advance the watermark
      // here and are then dropped with the heartbeats, so a
      // marker-bearing chunk never counts liveness records as data.
      .filter(guard(col("op") =!= Op.Heartbeat &&
        !col("op").isin(Op.markers: _*)))

  /** Wrap `cond` so the optimizer cannot push it below an
    * EventTimeWatermark node (it references the event-time column
    * non-foldably) — row filtering on a heartbeat-watermarked stream
    * must happen AFTER the stats observe every record. */
  def guardedFilter(df: DataFrame, cond: org.apache.spark.sql.Column): DataFrame =
    df.filter(guard(cond))

  /** Data-changing records only, watermark-safe. */
  def dmlOnly(df: DataFrame): DataFrame =
    guardedFilter(df, col("op").isin(Op.Insert, Op.Update, Op.Delete))

  private def guard(cond: org.apache.spark.sql.Column) =
    cond || col("ts") < to_timestamp(lit("1900-01-01"))

  /** Watermarked tumbling-window op counts — the reference's
    * watermarked SQL shape. Works on the streaming frame. */
  def windowedOpCounts(changes: DataFrame, window: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    changes
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("op"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_us"), col("op"), col("n"))

  /** Watermarked tumbling-window record counts in APPEND mode — the
    * allowed-lateness surface (Flink's
    * `allowedLateness`/side-output contract, the Spark half): a window
    * emits exactly once, when the watermark passes its end; an input
    * record whose window has already been finalized (window end ≤ the
    * watermark in force at its arrival) is DROPPED by the stateful
    * operator, while a late record whose window is still open — late
    * by event time but within the allowed lateness the delay buys —
    * still counts. Heartbeats advance the watermark and are then
    * dropped ([[withHeartbeatWatermark]]), so a final liveness record
    * is what flushes the last open windows at end of stream. The
    * dropped records are the ones a Flink pipeline would route to its
    * late-data side output; [[graft.cdc.CdcQueries]] cdc24 pairs this
    * with the declarative side-output leg and oracle-gates both. */
  def windowedOnTimeCounts(
      changes: DataFrame, valueExpr: org.apache.spark.sql.Column,
      win: String = "10 seconds",
      watermark: String = "10 minutes"): DataFrame =
    withHeartbeatWatermark(changes, watermark)
      .groupBy(window(col("ts"), win), valueExpr.as("value"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_us"),
        col("value"), col("n"))

  /** Streaming session windows: per-key activity sessions with a gap
    * timeout (Flink session windows), emitted on watermark close. */
  def sessionizedActivity(
      changes: DataFrame, gap: String = "10 seconds",
      watermark: String = "10 seconds"): DataFrame = {
    changes
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withColumn("key", keyExpr)
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("key"))
      .agg(count(lit(1)).as("n_changes"))
      .select(col("key"), unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"), col("n_changes"))
  }

  /** Stream-stream interval join: records of `leftOp` joined to
    * records of `rightOp` for the same key within ±tolerance event
    * time — the streaming form of a range join, with watermarks on
    * both sides bounding join state (Spark evicts state older than
    * watermark + tolerance; without the bound a 100 TB stream would
    * accumulate unbounded state).
    *
    * `joinType` "inner" (default) emits matches on arrival;
    * "leftOuter" additionally emits each unmatched left record ONCE
    * with null right columns — but only after the watermark passes
    * `l_ts + tolerance` (before that a future match could still
    * arrive), Flink's outer interval-join contract. A caller wanting
    * the outer rows flushed at stream end must advance the watermark
    * past the data horizon (e.g. a terminal liveness record on BOTH
    * sides — the cdc24 in-band pattern). */
  def intervalJoin(
      changes: DataFrame, leftOp: String, rightOp: String,
      toleranceUs: Long, watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    // only these two modes carry the emission/flush contract the
    // docstring documents (ADVICE r12: an unvalidated passthrough
    // would hand e.g. "fullOuter" a liveness pattern nobody wrote)
    require(joinType == "inner" || joinType == "leftOuter",
      s"intervalJoin supports joinType inner|leftOuter, got '$joinType'")
    def side(op: String, prefix: String) =
      changes.filter(col("op") === op)
        .select(
          col("id").as(s"${prefix}_id"),
          keyExpr.as(s"${prefix}_key"),
          timestamp_micros(col("tsUs")).as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", watermark)
    side(leftOp, "l").join(side(rightOp, "r"),
      expr(s"""l_key = r_key AND
        |r_ts BETWEEN l_ts - INTERVAL $toleranceUs MICROSECOND
        |         AND l_ts + INTERVAL $toleranceUs MICROSECOND
        |""".stripMargin), joinType)
      .select(col("l_id"), col("r_id"), col("l_key").as("key"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts"))).as("delta_us"))
  }

  /** Stream-stream WINDOW JOIN — Flink SQL's window join (round 13):
    * both streams tumbled into the SAME window
    * (`TUMBLE(TABLE l …) JOIN TUMBLE(TABLE r …) ON l.window_start =
    * r.window_start AND l.key = r.key`), the windowed sibling of
    * [[intervalJoin]]. Re-expressed Spark-first: `window()` buckets on
    * both watermarked sides and an equi-join on (window, key) — the
    * window column derives from event time, so Spark's state store
    * evicts whole windows once the watermark passes their end: at
    * 100 TB the join never holds more state than open-windows × keys
    * within the disorder horizon, the same bound Flink's window join
    * carries. Inner-join emission is on arrival (the watermark bounds
    * EVICTION, not emission), so the final emitted set is
    * arrival-order-free — exactly the property the oracle gate pins. */
  def windowJoin(
      changes: DataFrame, leftOp: String, rightOp: String,
      windowDur: String, watermark: String = "10 minutes"): DataFrame = {
    def side(op: String, prefix: String) =
      changes.filter(col("op") === op)
        .select(col("id").as(s"${prefix}_id"),
          keyExpr.as(s"${prefix}_key"),
          timestamp_micros(col("tsUs")).as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", watermark)
        .withColumn(s"${prefix}_w",
          window(col(s"${prefix}_ts"), windowDur))
    side(leftOp, "l").join(side(rightOp, "r"),
      expr("l_w = r_w AND l_key = r_key"))
      .select(col("l_id"), col("r_id"), col("l_key").as("key"),
        unix_micros(col("l_w.start")).as("win_us"))
  }

  /** DDL records surfaced as a schema-change control stream (ref:
    * OperationType.java:8 includes DDL; the reference delivers them
    * in-band with the data records). The statement travels in the
    * after image under `ddl`/`statement`; a consumer reacts to the
    * control stream (e.g. re-declaring a [[graft.cdc.TypedSchema]])
    * while the DML materializer ([[materialize]]) is oblivious —
    * DDLs never disturb key state. */
  def ddlEvents(changes: DataFrame): DataFrame =
    changes.filter(col("op") === graft.cdc.Op.Ddl)
      .select(col("id"), col("tsUs"), col("db"), col("tbl"),
        coalesce(element_at(col("after"), "ddl"),
          element_at(col("after"), "statement")).as("statement"))

  /** At-least-once delivery → exactly-once semantics: drop redelivered
    * records by id within the watermark horizon (the reference's
    * consumer can re-read after a Dstore failover reseek; ref:
    * FlinkDtsRawConsumer.java checkpoint/retry path). */
  def dedupRedelivered(changes: DataFrame, watermark: String = "10 minutes"): DataFrame =
    changes
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("id")

  /** Retract-stream element: `change` is +1 (add) or -1 (retract of a
    * previously-emitted add). Sum of `change` grouped by any attribute
    * of `value` is always the live-row count for that attribute —
    * the property Flink's toRetractStream gives downstream aggregates
    * (ref: DtsTableISelectTCaseTest.java:91 toRetractStream). */
  final case class RetractEvent(
      change: Int, key: String, tsUs: Long, recordId: Long, value: String)

  /** Per-key state of the retract materializer (public: the state
    * encoder's generated code must see the constructor). */
  final case class RetractState(
      tsUs: Long, recordId: Long, value: String, alive: Boolean)

  /** Changelog → retract stream: every state transition emits the
    * retraction of the key's previous live row (carrying the OLD
    * value) before the add of the new one, so a downstream aggregate
    * over any value attribute stays correct under UPDATE/DELETE —
    * upsert-only output ([[materialize]]) over-counts updated rows.
    *
    * `valueExpr` extracts the aggregated attribute from a change row
    * (e.g. `element_at(col("after"), "v")`). Per-key state is O(1) and
    * keys partition across executors (same 100 TB posture as
    * [[materialize]]).
    */
  def materializeRetract(
      changes: DataFrame, valueExpr: org.apache.spark.sql.Column)(
      implicit spark: SparkSession): Dataset[RetractEvent] = {
    import spark.implicits._
    val dml = changes
      .filter(col("op").isin(Op.Insert, Op.Update, Op.Delete))
      .select(
        keyExpr.as("key"),
        col("tsUs"), col("id").as("recordId"), col("op"),
        valueExpr.cast("string").as("value"))
      .as[(String, Long, Long, String, String)]

    dml.groupByKey(_._1)
      .flatMapGroupsWithState[RetractState, RetractEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[RetractState]) =>
          var cur = state.getOption.orNull
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          val out = scala.collection.mutable.ArrayBuffer.empty[RetractEvent]
          sorted.foreach { case (_, tsUs, recordId, op, value) =>
            val newer = cur == null || tsUs > cur.tsUs ||
              (tsUs == cur.tsUs && recordId > cur.recordId)
            if (newer) {
              if (cur != null && cur.alive)
                out += RetractEvent(-1, key, tsUs, recordId, cur.value)
              if (op != Op.Delete)
                out += RetractEvent(1, key, tsUs, recordId, value)
              val keptValue = if (op == Op.Delete && cur != null) cur.value else value
              cur = RetractState(tsUs, recordId, keptValue, alive = op != Op.Delete)
            }
          }
          if (cur != null) state.update(cur)
          out.iterator
      }
  }

  /** Retract stream → downstream live-count aggregate in ONE streaming
    * query: Spark permits aggregation after Append-mode
    * flatMapGroupsWithState, so the sign-sum runs as a second stateful
    * operator in the same plan — the Flink `toRetractStream → GROUP
    * BY` topology (ref: DtsTableISelectTCaseTest.java:91) without
    * landing the intermediate retract stream anywhere. Run the query
    * in update/complete output mode; `live_rows` is exact under
    * UPDATE/DELETE because every add was preceded by the retraction
    * of the key's previous value. */
  def liveCountByValue(
      changes: DataFrame, valueExpr: org.apache.spark.sql.Column)(
      implicit spark: SparkSession): DataFrame =
    materializeRetract(changes, valueExpr)
      .groupBy(col("value"))
      .agg(sum(col("change")).as("live_rows"))

  /** Retract stream → WINDOWED live-count aggregate in one streaming
    * query: the event-time variant of [[liveCountByValue]] — sign-sums
    * per (tumbling window, value), watermark bounding the window
    * state. Run in update/complete mode; a window's sums become final
    * once the watermark passes it. */
  def windowedLiveCounts(
      changes: DataFrame, valueExpr: org.apache.spark.sql.Column,
      win: String = "10 seconds", watermark: String = "0 seconds")(
      implicit spark: SparkSession): DataFrame =
    materializeRetract(changes, valueExpr)
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win), col("value"))
      .agg(sum(col("change")).as("live_rows"))
      .select(unix_micros(col("window.start")).as("win_us"),
        col("value"), col("live_rows"))

  /** Current state of one logical key, as maintained by the upsert
    * materializer. */
  final case class KeyState(
      key: String, tsUs: Long, recordId: Long, op: String, alive: Boolean)

  /** Changelog → continuously-maintained current state: last DML wins,
    * DELETE tombstones. Emits the new state of a key every time it
    * changes (update-style changelog of the materialized view).
    *
    * Per-key state is O(1); keys partition across executors, so this
    * holds at a 100 TB keyspace the same way Flink keyed state does.
    */
  def materialize(
      changes: DataFrame)(implicit spark: SparkSession): Dataset[KeyState] = {
    import spark.implicits._
    val dml = changes
      .filter(col("op").isin(Op.Insert, Op.Update, Op.Delete))
      .select(
        keyExpr.as("key"),
        col("tsUs"), col("id").as("recordId"), col("op"))
      .as[(String, Long, Long, String)]

    dml.groupByKey(_._1)
      .flatMapGroupsWithState[KeyState, KeyState](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[KeyState]) =>
          var cur = state.getOption.orNull
          // chunk order == time order within a key; still sort the
          // micro-batch slice defensively
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          val out = scala.collection.mutable.ArrayBuffer.empty[KeyState]
          sorted.foreach { case (_, tsUs, recordId, op) =>
            val newer = cur == null || tsUs > cur.tsUs ||
              (tsUs == cur.tsUs && recordId > cur.recordId)
            if (newer) {
              cur = KeyState(key, tsUs, recordId, op, alive = op != Op.Delete)
              out += cur
            }
          }
          if (cur != null) state.update(cur)
          out.iterator
      }
  }
}
