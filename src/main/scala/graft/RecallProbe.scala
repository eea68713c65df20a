package graft

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
    } finally spark.stop()
  }
}
