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
  * cap.
  */
final case class CdcSubscription(
    server: String,
    topic: String = "default",
    sid: Option[String] = None,
    group: Option[String] = None,
    checkpoint: Option[String] = None,
    maxChunksPerTrigger: Option[Int] = None) {

  require(server != null && server.nonEmpty, "cdc subscription: 'server' is required")
  require(sid.isDefined || group.isDefined,
    "cdc subscription: one of 'sid' or 'group' is required (ref DtsOptions semantics)")

  /** Start position in epoch micros, parsed from either a raw number
    * or a datetime string (checkpoint repositioning,
    * ref fetcher/ClusterSwitchListener.java). */
  def checkpointUs: Option[Long] = checkpoint.map { c =>
    if (c.forall(_.isDigit)) c.toLong else Values.dateTimeToMicros(c)
  }

  def path: String = s"$server/$topic"

  def readStream(spark: SparkSession): DataFrame =
    graft.streaming.CdcStreaming.readStream(
      spark, path, checkpointUs, maxChunksPerTrigger)

  def readBatch(spark: SparkSession): DataFrame =
    graft.streaming.CdcStreaming.readBatch(spark, path, checkpointUs)
}
