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

  test("k larger than group size returns whole groups") {
    val r = Tables.load(spark, sf, "region")
    val df = TopKPerGroup(r, Seq(r("r_regionkey")), Seq(r("r_name").asc), 10)
    assert(df.count() == r.count())
  }
}
