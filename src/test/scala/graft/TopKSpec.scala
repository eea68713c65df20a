package graft

import graft.plans.TopKPerGroup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("custom top-k operator matches windowed row_number") {
    val o = Tables.load(spark, sf, "orders")
    val custom = TopKPerGroup(o,
      Seq(o("o_orderpriority")),
      Seq(o("o_totalprice").desc, o("o_orderkey").asc), 3)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    val windowed = SparkEntry.queries("q09_topn_group")(spark, sf)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    assert(custom.count() == windowed.count())
    assert(custom.except(windowed).count() == 0)
    assert(windowed.except(custom).count() == 0)
  }

  test("physical plan uses TopKPerGroupExec, not Sort+Window") {
    val o = Tables.load(spark, sf, "orders")
    val df = TopKPerGroup(o, Seq(o("o_orderstatus")),
      Seq(o("o_totalprice").asc), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"))
    assert(!plan.contains("Window"))
    assert(!plan.toLowerCase.contains("sortexec"))
    assert(df.count() == 6) // 3 statuses x 2 — sf0.001 has all statuses
  }

  test("map-side partial bounds the shuffle to keys x k per partition") {
    // AQE wraps stages in QueryStageExec nodes that hide the partial
    // from TreeNode.collect — turn it off for the metric assertion
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val o = Tables.load(spark, sf, "orders")
      .repartition(8) // force multiple map partitions upstream
    val k = 3
    val df = TopKPerGroup(o, Seq(o("o_orderpriority")),
      Seq(o("o_totalprice").desc, o("o_orderkey").asc), k)
    df.collect()
    val partial = df.queryExecution.executedPlan.collectFirst {
      case p: graft.plans.TopKPartialExec => p
    }
    assert(partial.isDefined, "partial phase missing from the plan")
    val shuffled = partial.get.metrics("shuffleRows").value
    val nKeys = o.select("o_orderpriority").distinct().count()
    val nParts = 8
    val inputRows = o.count()
    assert(shuffled <= nKeys * k * nParts,
      s"$shuffled rows shuffled, bound is ${nKeys * k * nParts}")
    assert(shuffled < inputRows,
      s"partial did not reduce the shuffle: $shuffled vs $inputRows input")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("k larger than group size returns whole groups") {
    val r = Tables.load(spark, sf, "region")
    val df = TopKPerGroup(r, Seq(r("r_regionkey")), Seq(r("r_name").asc), 10)
    assert(df.count() == r.count())
  }
}
