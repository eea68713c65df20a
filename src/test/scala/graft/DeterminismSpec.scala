package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-invariance evidence: the engine's results must be
  * byte-identical regardless of parallelism (the difference between
  * local[4] and a 1000-executor cluster is only partition count) —
  * this is what the exact-decimal accumulation and fixed-fold vector
  * math buy (SURVEY §3/§5).
  */
class DeterminismSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private val sensitive = Seq(
    "q04_agg_group",      // decimal sums of double products
    "q08_join_star",      // multiway join + decimal agg
    "dd05_embed_dup",     // float fold + threshold (blocked GEMM)
    "dd06_dup_clusters",  // iterative label propagation fixpoint
    "ann01_knn_brute",    // float fold + ranking
    "ann03_knn_ivf",      // k-means on a collected sample + probing
    "ann04_knn_ivfpq",    // PQ codebooks + ADC + exact re-rank
    "cdc09_temporal_join",// carried-image window over a union
    "dd07_decontaminate", // broadcast benchmark index + array ops
    "tx06_rareword",      // tie-broken top-df vocabulary
    "tx02_quality",       // double ratio arithmetic
    "tx05_keyterms",      // tie-broken ranking over shuffled aggs
    "emb02_label_centroid", // native long-array agg merge order
    "pk01_seq_pack",      // per-shard windowed cumsum
    "tx09_unigram_lm",    // vocab join + integer sums
    "cdc10_sink_materialize", // sink append/fold/merge chain state
    "mm03_phash_dedup",   // banded join + distinct pair set
    "q36_join_full_outer", // two-sided null extension + decimal sums
    "emb03_trunc_recall") // double rank windows on two vector scales

  test("results are identical at 1x and 16x input partitioning") {
    sensitive.foreach { name =>
      val fn = SparkEntry.queries(name)
      val base = fn(spark, sf)
      // force radically different partitioning upstream of every
      // aggregation by changing the split size => different task
      // boundaries, different accumulation groupings
      val conf = "spark.sql.files.maxPartitionBytes"
      val old = spark.conf.get(conf)
      try {
        spark.conf.set(conf, (64 * 1024).toString) // 64 KiB splits
        val repartitioned = fn(spark, sf)
        withClue(name) {
          assert(repartitioned.count() == base.count())
          assert(repartitioned.except(base).count() == 0)
          assert(base.except(repartitioned).count() == 0)
        }
      } finally spark.conf.set(conf, old)
    }
  }

  test("shuffle partition count does not change results") {
    val conf = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(conf)
    val fn = SparkEntry.queries("q04_agg_group")
    try {
      spark.conf.set(conf, "1")
      val p1 = fn(spark, sf).collect().toSet
      spark.conf.set(conf, "17")
      val p17 = fn(spark, sf).collect().toSet
      assert(p1 == p17)
    } finally spark.conf.set(conf, old)
  }
}
