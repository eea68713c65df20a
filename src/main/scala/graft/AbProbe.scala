package graft

/** Dev-only INTERLEAVED A/B timer for the scratch-medium decision
  * (optimization round 17). Timeit-style full-plan executions, but the
  * two arms alternate WITHIN one JVM, seconds apart:
  *
  *   A = `graft.scratch` system property pinned to java.io.tmpdir
  *       (the pre-round-17 scratch medium), then
  *   B = property cleared (→ [[Scratch]]'s own resolution, /dev/shm
  *       when the host has one), A, B, ... per rep.
  *
  * Rationale: this box drifts through multi-minute degradation epochs
  * (documented in OPTIMIZATION_r17.md — untouched queries move 2-3×
  * between back-to-back runs), so two Timeit invocations minutes apart
  * measure the epoch, not the treatment. Alternating arms per rep puts
  * both arms inside every epoch; the per-arm min/median over several
  * rounds is then comparable.
  *
  * VALIDITY (ADVICE r17): the arm flip only moves queries whose ring
  * dirs are resolved PER CALL (the cdc10-27 sink/checkpoint gates,
  * ing01/ing03). Once-per-dir memoized builders (dd06's clusterTable,
  * dd15, the ann member-index/walk/insert registries, cdc08's _DONE
  * marker) resolve their scratch path at first build and keep it for
  * the JVM's life — for those queries both arms measure the same
  * medium and the probe reads as a null result by construction.
  *
  * Usage: runMain graft.AbProbe <sfDir> <name,name,...> [rounds]
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    require(args.length > 1,
      "usage: AbProbe <sfDir> <name,name,...> [rounds]")
    val names = args(1).split(",").toSeq
    val rounds = if (args.length > 2) args(2).toInt else 3
    val tmp = System.getProperty("java.io.tmpdir")
    val spark = GraftSession.fromEnv(appName = "graft-abprobe")
    def arm(on: Boolean): Unit =
      if (on) sys.props("graft.scratch") = tmp
      else sys.props.remove("graft.scratch")
    def exec(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
      val d = (System.nanoTime() - t0) / 1e9
      GraftSession.sweep(spark)
      d
    }
    names.foreach { n =>
      // one warm pass per arm (JIT + each medium's dir rings exist)
      arm(true); exec(n); arm(false); exec(n)
      val as = scala.collection.mutable.ArrayBuffer.empty[Double]
      val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to rounds).foreach { r =>
        arm(true); val a = exec(n)
        arm(false); val b = exec(n)
        as += a; bs += b
        println(f"ABPROBE $n round$r A=$a%.3f B=$b%.3f")
      }
      // proper median: mean of the middle pair for even round counts
      def med(xs: Seq[Double]): Double = {
        val s = xs.sorted
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      }
      println(f"ABPROBE $n SUMMARY minA=${as.min}%.3f minB=${bs.min}%.3f " +
        f"medA=${med(as.toSeq)}%.3f medB=${med(bs.toSeq)}%.3f")
    }
    spark.stop()
  }
}
