package graft

import org.apache.spark.sql.functions.col

/** Scratch diagnostic: recall@5 of each approximate ANN query vs the
  * brute-force truth, for parameter tuning. Not part of the driver
  * contract. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build(16, "recall-probe")
    try {
      Seq("ann02_knn_bucket", "ann03_knn_ivf", "ann04_knn_ivfpq").foreach { n =>
        val r = pipelines.Similarity.recallAtK(spark, dir, n)
        println(s"RECALL $n $r")
      }
      ceilingGrid(spark, dir)
    } finally spark.stop()
  }

  /** IVF probing CEILING per (C, NProbe): the fraction of brute-force
    * top-5 neighbors whose list is among the query's NProbe probes —
    * the recall any scoring inside those lists (exact or PQ) cannot
    * exceed. Driver-side math over the collected corpus; diagnostic
    * only (the corpus at probe scale is thousands of vectors). */
  private def ceilingGrid(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import pipelines.Similarity.Ivf
    import spark.implicits._
    val vecs = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorOps.toDouble("embedding").as("v"))
    val e = vecs.as[(Long, Array[Double])].collect().sortBy(_._1)
    val unit = e.map { case (id, v) => id -> Ivf.normalize(v) }.toMap
    val truth = SparkEntry.queries("ann01_knn_brute")(spark, dir)
      .select("q_id", "n_id").as[(Long, Long)].collect()
    // the PRODUCTION bounded sample (hash-ordered TrainCap cut), not a
    // reimplementation that could drift from what ann03/ann04 train on
    val sample = pipelines.Similarity.trainingSample(vecs)
    val sample2 = e.filter(_._1 % 2 == 0).map(t => Ivf.normalize(t._2))
    def ceil(cents: Array[Array[Double]], p: Int): Double = {
      val lists = unit.map { case (id, u) => id -> Ivf.assign(u, cents) }
      truth.count { case (q, n) =>
        Ivf.probes(unit(q), cents, p).contains(lists(n))
      }.toDouble / truth.length
    }
    // deterministic maximin (farthest-point) init: does better seeding
    // lift the ceiling at the same scan fraction?
    def maximinInit(s: Array[Array[Double]], c: Int): Array[Array[Double]] = {
      val chosen = scala.collection.mutable.ArrayBuffer(s(0))
      while (chosen.length < c) {
        var best = -1; var bestD = Double.NegativeInfinity
        var i = 0
        while (i < s.length) {
          var near = Double.NegativeInfinity // max dot = nearest on unit sphere
          chosen.foreach { ch => val d = Ivf.dot(s(i), ch); if (d > near) near = d }
          if (-near > bestD) { bestD = -near; best = i }
          i += 1
        }
        chosen += s(best)
      }
      chosen.toArray
    }
    // seeded runs reuse the PRODUCTION trainer (Ivf.train with an
    // explicit init) — a local Lloyd copy could silently drift from
    // what ann03/ann04 actually run
    def lloyd(s: Array[Array[Double]], init: Array[Array[Double]]): Array[Array[Double]] =
      Ivf.train(s, init.length, init)
    for (c <- Seq(16, 32, 64); p <- Seq(2, 4, 6, 8, 12, 16) if p < c) {
      val cents = Ivf.train(sample, c)
      println(f"CEIL      C=$c%-3d NProbe=$p%-3d scan=${p.toDouble / c}%.3f " +
        f"ceiling=${ceil(cents, p)}%.3f")
    }
    for (c <- Seq(16, 32); p <- Seq(4, 6, 8) if p < c) {
      val mm = lloyd(sample, maximinInit(sample, c))
      println(f"CEIL-MM   C=$c%-3d NProbe=$p%-3d scan=${p.toDouble / c}%.3f " +
        f"ceiling=${ceil(mm, p)}%.3f")
      val mm2 = lloyd(sample2, maximinInit(sample2, c))
      println(f"CEIL-MM2x C=$c%-3d NProbe=$p%-3d scan=${p.toDouble / c}%.3f " +
        f"ceiling=${ceil(mm2, p)}%.3f")
    }
  }
}
