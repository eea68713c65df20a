package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: one-line physical-plan audit per query — join strategies,
  * exchange count, parquet filter pushdown, codegen coverage. The
  * quick check that a plan would survive a 100x scale-up (SURVEY §5):
  * unexpected SortAggregate, nested-loop joins on big sides, or
  * missing PushedFilters show up immediately.
  *
  * Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.fromEnv(fallback = 8, appName = "graft-planaudit")
    spark.sparkContext.setLogLevel("ERROR")

    val markers = Seq(
      "BroadcastHashJoin" -> "bhj", "SortMergeJoin" -> "smj",
      "ShuffledHashJoin" -> "shj", "BroadcastNestedLoopJoin" -> "bnlj",
      "CartesianProduct" -> "cart", "SortAggregate" -> "sortagg",
      "ObjectHashAggregate" -> "objagg")

    SparkEntry.all.foreach { d =>
      try {
        val df = d.run(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        val found = markers.collect {
          case (m, tag) if plan.contains(m) =>
            s"$tag=${m.r.findAllIn(plan).size}"
        }
        val exchanges = "Exchange".r.findAllIn(plan).size
        val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).size
        val wsc = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size
        println(f"${d.name}%-22s exch=$exchanges wsc=$wsc pushed=$pushed ${found.mkString(" ")}")
      } catch {
        case e: Throwable => println(s"${d.name} ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
