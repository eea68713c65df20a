package graft.sinks

import graft.cdc.Op
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Continuous changelog → queryable table: the reference's downstream
  * use case (README: «数据接收完之后需要同步到大数据平台» — land the
  * subscription into the analytics store). Implemented as foreachBatch
  * merge-upsert over versioned parquet snapshots: each micro-batch
  * folds its records into the previous snapshot with last-DML-wins /
  * DELETE-tombstone semantics and publishes a new version; `_LATEST`
  * is a one-line pointer file swapped atomically.
  *
  * At 100 TB you'd swap the snapshot store for a lakehouse table
  * format (the merge is the same shuffle-on-key upsert); versioned
  * snapshots keep this self-contained and exactly-once here — a
  * replayed micro-batch (after crash-restart) rewrites the same
  * version id deterministically instead of double-applying.
  */
object CdcParquetSink {

  private val Latest = "_LATEST"

  /** Resolve the current snapshot path, if any. */
  def latestSnapshot(tableDir: String): Option[String] = {
    val marker = Paths.get(tableDir, Latest)
    if (Files.exists(marker))
      Some(Paths.get(tableDir, Files.readString(marker).trim).toString)
    else None
  }

  /** Read the materialized table (empty-schema-safe). */
  def readTable(spark: SparkSession, tableDir: String): Option[DataFrame] =
    latestSnapshot(tableDir).map(spark.read.parquet(_))

  /** Fold one micro-batch of change records into the table. */
  private[sinks] def applyBatch(
      spark: SparkSession, batch: DataFrame, tableDir: String,
      batchId: Long): Unit = {
    Files.createDirectories(Paths.get(tableDir))
    val pk1 = element_at(col("pkNames"), 1)
    val incoming = batch
      .filter(col("op").isin(Op.Insert, Op.Update, Op.Delete))
      .select(
        concat_ws("|", col("db"), col("tbl"),
          coalesce(element_at(col("after"), pk1),
            element_at(col("before"), pk1))).as("key"),
        col("tsUs"), col("id").as("recordId"), col("op"),
        col("after"))
    val merged = readTable(spark, tableDir) match {
      case Some(prev) => prev.unionByName(incoming)
      case None       => incoming
    }
    val w = Window.partitionBy(col("key"))
      .orderBy(col("tsUs").desc, col("recordId").desc)
    val next = merged
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= Op.Delete)
      .drop("rn")
    val version = f"v$batchId%012d"
    next.write.mode(SaveMode.Overwrite).parquet(s"$tableDir/$version")
    // atomic publish: tmp file + move
    val tmp = Paths.get(tableDir, s".$Latest.tmp")
    Files.writeString(tmp, version, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, Paths.get(tableDir, Latest),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Start the continuous materialization. */
  def start(
      changes: DataFrame, tableDir: String,
      checkpointDir: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, batch, tableDir, batchId)
      }
      .start()
}
