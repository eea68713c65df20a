package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global ranks over a salted-md5 permutation, WITHOUT
  * a global sort — the primitive under ann06's ring init and pk04's
  * shard shuffle. Both engines compute the identical hex keys
  * (md5(salt || id)), so the order is reproducible anywhere; the
  * Spark side never funnels the table through one partition:
  *
  *   rank = bucket_offset(first key byte) + row_number within bucket
  *
  * with the 256-row bucket histogram collected to the driver (a
  * bounded scalar job) and each per-bucket window running where the
  * bucket's rows live. The bucket is a MONOTONE PREFIX of the key,
  * so the two-phase rank equals ROW_NUMBER over the full (key, id)
  * order — which is exactly what the DuckDB oracle runs as one
  * window. At 100 TB this is the difference between a total order
  * and a single-partition sort bottleneck.
  */
object Ranking {

  /** (idCol, pos): 0-based global rank by (`valueCol` ASC, `idCol`
    * ASC) WITHOUT a global sort — the [[saltedRank]] two-phase shape
    * generalized to an arbitrary non-negative integer key: the coarse
    * bucket `value >> coarseShift` is a MONOTONE function of the key,
    * so bucket-offset + within-bucket row_number equals ROW_NUMBER
    * over the full order. The histogram collect is bounded by the
    * key's VALUE RANGE (range >> coarseShift buckets), never by the
    * row count — at 100 TB a bounded-range score (e.g. mean bits ≤
    * ~40, scaled 2^20) keeps the driver job a few hundred rows while
    * the per-bucket windows run where the rows live. */
  private[pipelines] def integerRank(
      df: DataFrame, valueCol: String, idCol: String,
      coarseShift: Int): DataFrame = {
    val keyed = df.select(col(idCol), col(valueCol).as("_rv"))
      .withColumn("_rb", expr(s"CAST(_rv div ${1L << coarseShift} AS INT)"))
    val counts = keyed.groupBy("_rb").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val wB = Window.partitionBy(col("_rb"))
      .orderBy(col("_rv").asc, col(idCol).asc)
    keyed
      .withColumn("pos",
        element_at(typedlit(offsets), col("_rb")) +
          row_number().over(wB) - 1)
      .select(col(idCol), col("pos"))
  }

  /** (idCol, pos): 0-based dense rank of each row in the salted-md5
    * permutation. `df` must contain `idCol` with distinct values. */
  private[pipelines] def saltedRank(
      df: DataFrame, salt: String, idCol: String): DataFrame = {
    val keyed = df.select(col(idCol),
        md5(concat(lit(salt), col(idCol).cast("string"))).as("_rk"))
      .withColumn("_rb", conv(substring(col("_rk"), 1, 2), 16, 10).cast("int"))
    val counts = keyed.groupBy("_rb").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val wB = Window.partitionBy(col("_rb"))
      .orderBy(col("_rk").asc, col(idCol).asc)
    keyed
      .withColumn("pos",
        element_at(typedlit(offsets), col("_rb")) +
          row_number().over(wB) - 1)
      .select(col(idCol), col("pos"))
  }
}
