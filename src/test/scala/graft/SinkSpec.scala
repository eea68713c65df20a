package graft

import graft.cdc.Op
import graft.sinks.CdcParquetSink
import graft.sources.CdcChunkFile
import graft.streaming.CdcStreaming
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("continuous materialization: streamed table equals batch upsert") {
    val dir = Files.createTempDirectory("gcl").toString
    val tableDir = Files.createTempDirectory("tbl").toString
    val ckpt = Files.createTempDirectory("ck").toString
    CdcFixtures.writeChunks(dir)
    val q = CdcParquetSink.start(
      CdcStreaming.readStream(spark, dir, maxChunksPerTrigger = Some(1)),
      tableDir, ckpt)
    try q.processAllAvailable() finally q.stop()

    val table = CdcParquetSink.readTable(spark, tableDir).get
    // expected: last DML per key, DELETE tombstoned (key k2 deleted by
    // record 29; k0 -> 27, k1 -> 28 survive)
    val byKey = table.collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("recordId")).toMap
    assert(byKey.values.toSet == Set(27L, 28L))
    assert(!byKey.keySet.exists(_.endsWith("k2")))
    // after-image preserved
    val after = table.filter(col("recordId") === 27L)
      .select(element_at(col("after"), "v")).head().getString(0)
    assert(after == "v27")
  }

  test("late chunk after restart folds into a new snapshot version") {
    val dir = Files.createTempDirectory("gcl").toString
    val tableDir = Files.createTempDirectory("tbl").toString
    val ckpt = Files.createTempDirectory("ck").toString
    CdcFixtures.writeChunks(dir)
    def run() = {
      val q = CdcParquetSink.start(
        CdcStreaming.readStream(spark, dir), tableDir, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val v1 = CdcParquetSink.latestSnapshot(tableDir).get
    // k2 comes back to life after its delete
    CdcChunkFile.write(s"$dir/chunk-00050${CdcChunkFile.Extension}",
      Seq(CdcFixtures.rec(200L, 99000000L, Op.Insert, "k2", "reborn")))
    run()
    val v2 = CdcParquetSink.latestSnapshot(tableDir).get
    assert(v1 != v2)
    val table = CdcParquetSink.readTable(spark, tableDir).get
    assert(table.filter(col("recordId") === 200L).count() == 1)
    assert(table.count() == 3) // k0, k1, reborn k2
  }

  test("dedupRedelivered drops exact redeliveries by record id") {
    val dir = Files.createTempDirectory("gcl").toString
    val recs = CdcFixtures.writeChunks(dir)
    // chunk 3 redelivers the first 10 records (failover replay)
    CdcChunkFile.write(s"$dir/chunk-00090${CdcChunkFile.Extension}",
      recs.take(10))
    val q = CdcStreaming.dedupRedelivered(CdcStreaming.readStream(spark, dir))
      .writeStream.format("memory").queryName("dedup_redeliver_t")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_redeliver_t")
      assert(got.count() == recs.size) // duplicates collapsed
      assert(got.select("id").distinct().count() == recs.size)
    } finally q.stop()
  }
}
