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
  */
final case class CdcSubscription(
    server: String,
    topic: String = "default",
    sid: Option[String] = None,
    group: Option[String] = None,
    checkpoint: Option[String] = None,
    maxChunksPerTrigger: Option[Int] = None,
    table: Option[String] = None) {

  require(server != null && server.nonEmpty, "cdc subscription: 'server' is required")
  require(sid.isDefined || group.isDefined,
    "cdc subscription: one of 'sid' or 'group' is required (ref DtsOptions semantics)")
  table.foreach(CdcSource.parseTableSelector) // validate eagerly

  /** Start position in epoch micros, parsed from either a raw number
    * or a datetime string (checkpoint repositioning,
    * ref fetcher/ClusterSwitchListener.java). An empty or junk value
    * fails here with a clear message, not a bare NumberFormatException
    * downstream. */
  def checkpointUs: Option[Long] = checkpoint.map { c =>
    if (c.matches("\\d+")) c.toLong
    else
      try Values.dateTimeToMicros(c)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"cdc subscription: bad 'checkpoint' value '$c' — expected " +
            "epoch micros or a datetime string", e)
      }
  }

  def path: String = s"$server/$topic"

  def readStream(spark: SparkSession): DataFrame =
    graft.streaming.CdcStreaming.readStream(
      spark, path, checkpointUs, maxChunksPerTrigger, table)

  def readBatch(spark: SparkSession): DataFrame =
    graft.streaming.CdcStreaming.readBatch(spark, path, checkpointUs, table)
}
