package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the physical plan and wall time for one query.
  * Usage: runMain graft.Explain <queryName> [sfDir] [runs]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.fromEnv(fallback = 32, appName = "graft-explain")
    val fn = SparkEntry.queries(name)
    fn(spark, dir).explain("formatted")
    (1 to runs).foreach { i =>
      if (sys.env.contains("GRAFT_GC_BETWEEN")) System.gc()
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val n = df.count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      // AQE stage reuse is only visible AFTER execution — print the
      // final adaptive plan on demand
      if (i == 1 && sys.env.contains("GRAFT_FINAL_PLAN")) {
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
