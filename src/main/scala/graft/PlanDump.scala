package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dev tool (optimization round): dump `explain("formatted")` for a
  * set of queries to files — the plan evidence the round's
  * `plans/r17/<query>_{before,after}.txt` deliverable requires.
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [name,...]
  * NOTE: building a streaming gate's frame RUNS its streaming section
  * (the declared frame is the sink read-back); the dumped plan is the
  * plan of the frame a consumer of the declared query executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names =
      if (args.length > 3 && args(3) != "all") args(3).split(",").toSeq
      else SparkEntry.all.map(_.name)
    val spark = GraftSession.fromEnv(appName = "graft-plandump")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${n}_$suffix.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        println(s"[plandump] $n ok")
      } catch {
        case e: Throwable =>
          println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
      GraftSession.sweep(spark)
    }
    spark.stop()
  }
}
