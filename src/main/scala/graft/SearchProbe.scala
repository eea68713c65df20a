package graft

import org.apache.spark.sql.functions._

/** Scratch diagnostic for the ann07 graph-search rung: recall@5 vs
  * the member-only brute truth and the measured scan budget (distinct
  * scored (q_id, n_id) pairs per query vs the member corpus) at a
  * given SF. Not part of the driver contract. */
object SearchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build(16, "search-probe")
    try {
      val (scannedPerQ, memberN) =
        pipelines.Similarity.searchScanStats(spark, dir)
      val recall = pipelines.Similarity.recallHeldOutAtK(spark, dir)
      println(f"SEARCH recall@5=$recall%.3f scanned/q=$scannedPerQ%.1f " +
        f"members=$memberN frac=${scannedPerQ / memberN}%.4f")
      val (rRepaired, rRebuilt) =
        pipelines.Similarity.recallAfterDelete(spark, dir)
      println(f"DELETE recall@5 repaired=$rRepaired%.3f " +
        f"rebuilt=$rRebuilt%.3f gap=${rRebuilt - rRepaired}%.3f")
    } finally spark.stop()
  }
}

/** Scratch diagnostic (round 13, VERDICT r12 #3): the ann14 routing
  * kernel's recall on the deterministic CLUSTERED corpus variant vs
  * the isotropic original — the measurement that separates routing
  * QUALITY from scan-fraction chance. Not part of the driver
  * contract. */
object RoutedClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build(16, "routed-cluster-probe")
    try {
      val (rIso, fIso) = pipelines.Similarity.recallRoutedMaxSim(spark, dir)
      println(f"ROUTED isotropic recall@5=$rIso%.3f frac=$fIso%.4f " +
        f"lift=${rIso / fIso}%.1fx")
      val (rCl, fCl) = pipelines.Similarity.routedClusteredProbe(spark, dir)
      println(f"ROUTED clustered recall@5=$rCl%.3f frac=$fCl%.4f " +
        f"lift=${rCl / fCl}%.1fx")
      val r15 = pipelines.Similarity.recallAtK(spark, dir, "ann15_binary_quant")
      println(f"ANN15 recall@5=$r15%.3f (corpus-scaled depth)")
    } finally spark.stop()
  }
}
