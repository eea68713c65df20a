package graft

/** Dev-only per-query timer: Bench's warm-then-timed pattern over an
  * arbitrary query subset, without Bench's JSON/stream/recall overhead.
  * Usage: runMain graft.Timeit <sfDir> [name,name,...] [reps]
  * Lets a perf fix be measured in isolation AND after other queries
  * warmed the JVM (the two profiles BENCH regressions differ by).
  */
object Timeit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1 && args(1) != "all") args(1).split(",").toSeq
      else SparkEntry.all.map(_.name)
    val reps = if (args.length > 2) args(2).toInt else 1
    // 4th arg "count" falls back to the pre-round-8 df.count() probe
    // (which Catalyst can prune — see Bench.exec); default measures
    // the FULL plan
    val useCount = args.length > 3 && args(3) == "count"
    val spark = GraftSession.fromEnv(appName = "graft-timeit")
    def exec(n: String): Long = {
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (useCount) df.count() else df.queryExecution.toRdd.count()
    }
    names.foreach { n =>
      exec(n)
      GraftSession.sweep(spark)
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        exec(n)
        println(f"TIMEIT $n rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
        GraftSession.sweep(spark)
      }
    }
    spark.stop()
  }
}
