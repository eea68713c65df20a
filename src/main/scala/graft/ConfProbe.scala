package graft

/** Dev-only Timeit variant with session-conf overrides — measures a
  * RUNTIME-conf hypothesis (e.g. AQE off for the iterative walk
  * queries, whose cost is AQE stage-materialization job count) without
  * touching query code. Overrides apply to the probe session only;
  * nothing is persisted.
  * Usage: runMain graft.ConfProbe <sfDir> <k=v[+k=v...]|-> <name,...> [reps]
  * ('+' separates confs — ';' would be eaten by sbt's command parser)
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    require(args.length > 2,
      "usage: ConfProbe <sfDir> <k=v[+k=v...]|-> <name,...> [reps]")
    val sfDir = args(0)
    val confs = if (args(1) == "-") Nil
      else args(1).split("\\+").toSeq.map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val names = args(2).split(",").toSeq
    val reps = if (args.length > 3) args(3).toInt else 2
    val spark = GraftSession.fromEnv(appName = "graft-confprobe")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    def exec(n: String): Long =
      SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
    names.foreach { n =>
      exec(n)
      GraftSession.sweep(spark)
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        exec(n)
        println(f"CONFPROBE $n rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s" +
          s" confs=${confs.map(c => c._1 + "=" + c._2).mkString(",")}")
        GraftSession.sweep(spark)
      }
    }
    spark.stop()
  }
}
