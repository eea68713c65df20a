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
      maxChunksPerTrigger: Option[Int] = None): DataFrame = {
    var r = spark.readStream.format("graft-cdc").option("path", path)
    startingTimestampUs.foreach(ts => r = r.option("startingTimestampUs", ts))
    maxChunksPerTrigger.foreach(n => r = r.option("maxChunksPerTrigger", n))
    r.load()
  }

  /** Batch view of the same chunks (shared scan code path). */
  def readBatch(
      spark: SparkSession,
      path: String,
      startingTimestampUs: Option[Long] = None): DataFrame = {
    var r = spark.read.format("graft-cdc").option("path", path)
    startingTimestampUs.foreach(ts => r = r.option("startingTimestampUs", ts))
    r.load()
  }

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

  /** At-least-once delivery → exactly-once semantics: drop redelivered
    * records by id within the watermark horizon (the reference's
    * consumer can re-read after a Dstore failover reseek; ref:
    * FlinkDtsRawConsumer.java checkpoint/retry path). */
  def dedupRedelivered(changes: DataFrame, watermark: String = "10 minutes"): DataFrame =
    changes
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("id")

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
    // logical key = db|table|pk-value; DELETEs carry the pk only in
    // the before image, INSERTs only in the after image
    val pk1 = element_at(col("pkNames"), 1)
    val dml = changes
      .filter(col("op").isin(Op.Insert, Op.Update, Op.Delete))
      .select(
        concat_ws("|", col("db"), col("tbl"),
          coalesce(element_at(col("after"), pk1),
            element_at(col("before"), pk1))).as("key"),
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
