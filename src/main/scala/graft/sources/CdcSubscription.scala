package graft.sources

import graft.cdc.Values
import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing subscription configuration — the engine's counterpart
  * of the reference's limited, validated option surface (ref:
  * table/DtsOptions.java: dts.server/topic/dts.sid/dts.group/
  * dts.user/dts.password/dts.checkpoint; README «限制用户行为，
  * 暴露有限的参数»). Spark-side, the transport endpoint is a chunk
  * directory and Spark checkpointing owns offsets, so broker
  * credentials collapse into `server` (the directory), `checkpoint`
  * (start position: epoch-us, or a datetime string) and the admission
  * cap. `table` selects a single `db.tbl` (ref:
  * DTSSubscribeTableSourceFactory.java `table.name`) and is pushed
  * into the partition reader — filtered records never parse their
  * row-image tail.
  *
  * `user`/`password` (ref: DtsOptions.java:44-51) matter only for a
  * networked broker; the file transport ignores them, but they
  * validate and flow into [[toKafkaOptions]] so a real endpoint is a
  * config change, not a code change.
  */
final case class CdcSubscription(
    server: String,
    topic: String = "default",
    sid: Option[String] = None,
    group: Option[String] = None,
    checkpoint: Option[String] = None,
    maxChunksPerTrigger: Option[Int] = None,
    table: Option[String] = None,
    user: Option[String] = None,
    password: Option[String] = None) {

  require(server != null && server.nonEmpty, "cdc subscription: 'server' is required")
  require(sid.isDefined || group.isDefined,
    "cdc subscription: one of 'sid' or 'group' is required (ref DtsOptions semantics)")
  require(user.isDefined == password.isDefined,
    "cdc subscription: 'user' and 'password' must be set together (ref DtsOptions)")
  table.foreach(CdcSource.parseTableSelector) // validate eagerly

  /** Start position in epoch micros, parsed from either a raw number
    * or a datetime string (checkpoint repositioning,
    * ref fetcher/ClusterSwitchListener.java). Round 15: a trailing
    * zone is honored — "2024-01-15 00:00:00 +08:00" or
    * "... Asia/Shanghai" reposition at that wall time IN that zone
    * (the [[graft.cdc.DtsDateTime]] zoned path); zoneless strings
    * stay UTC as before. An empty or junk value fails here with a
    * clear message, not a bare NumberFormatException downstream. */
  def checkpointUs: Option[Long] = checkpoint.map { c =>
    if (c.matches("\\d+")) c.toLong
    else
      try Values.dateTimeToMicros(c)
      catch {
        case _: Exception =>
          try {
            import graft.cdc.DtsDateTime
            val dt = DtsDateTime.parse(c,
              DtsDateTime.SegDateTimeNanos | DtsDateTime.SegTimezone)
            require(dt.timeZone != null && dt.year > 0)
            dt.toMicros
          } catch {
            case e: Exception => throw new IllegalArgumentException(
              s"cdc subscription: bad 'checkpoint' value '$c' — expected " +
                "epoch micros or a datetime string (optionally zoned)", e)
          }
      }
  }

  def path: String = s"$server/$topic"

  /** The same subscription as `spark-sql-kafka-0-10` reader options —
    * the structural bridge to the reference's day-1 deployment (the
    * DTS endpoint speaks the Kafka protocol; ref: DtsOptions.java
    * 21-57, DtsKafkaConsumerThread's fetch loop). This sandbox has no
    * broker, so the mapping is the deliverable: with the connector jar
    * on the classpath, `spark.readStream.format("kafka")
    * .options(sub.toKafkaOptions).load()` consumes the same
    * subscription over the wire —
    *
    *   - server → `kafka.bootstrap.servers`
    *   - topic → `subscribe`
    *   - group/sid → `kafka.group.id` (group preferred, the ref's
    *     consumer-group semantics; sid is its session analogue)
    *   - checkpoint → `startingTimestamp` (epoch-ms; the per-partition
    *     `startingOffsetsByTimestamp` form needs a partition map a
    *     config object cannot know) — exactly the reference's
    *     searchOffsetByTimestamp repositioning
    *   - user/password → SASL/PLAIN jaas config (the DTS broker's auth
    *     mode), else the PLAINTEXT protocol. With a `sid` the SASL
    *     username is the COMPOUND `"<user>-<sid>"` — the reference's
    *     buildJaasConfig renders exactly that
    *     (DtsKafkaUtil.java:55-66: `username="%s-%s"` when sid is
    *     non-empty), and a real endpoint rejects the bare user; the
    *     sid rides INSIDE the username, never as its own option
    *   - maxChunksPerTrigger → `maxOffsetsPerTrigger` (admission
    *     control; a chunk holds [[CdcChunkFile]] record batches, so
    *     the cap converts at that granularity)
    */
  def toKafkaOptions: Map[String, String] = {
    def jaasEscape(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val base = Map(
      "kafka.bootstrap.servers" -> server,
      "subscribe" -> topic) ++
      group.orElse(sid).map("kafka.group.id" -> _) ++
      checkpointUs.map(us => "startingTimestamp" -> (us / 1000L).toString) ++
      maxChunksPerTrigger.map(n =>
        "maxOffsetsPerTrigger" -> (n.toLong * CdcChunkFile.SplitStride).toString)
    val auth = (user, password) match {
      case (Some(u), Some(p)) =>
        // compound username with a sid (ref DtsKafkaUtil.buildJaasConfig)
        val uname = sid.filter(_.nonEmpty).fold(u)(s => s"$u-$s")
        Map(
          "kafka.security.protocol" -> "SASL_PLAINTEXT",
          "kafka.sasl.mechanism" -> "PLAIN",
          "kafka.sasl.jaas.config" ->
            ("org.apache.kafka.common.security.plain.PlainLoginModule required " +
              s"""username="${jaasEscape(uname)}" password="${jaasEscape(p)}";"""))
      case _ => Map("kafka.security.protocol" -> "PLAINTEXT")
    }
    base ++ auth
  }

  def readStream(spark: SparkSession): DataFrame =
    graft.streaming.CdcStreaming.readStream(
      spark, path, checkpointUs, maxChunksPerTrigger, table)

  def readBatch(spark: SparkSession): DataFrame =
    graft.streaming.CdcStreaming.readBatch(spark, path, checkpointUs, table)
}
