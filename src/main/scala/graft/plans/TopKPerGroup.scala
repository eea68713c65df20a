package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BaseOrdering, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graft.ColumnBridge

import scala.collection.mutable

/** Per-group top-k as a first-class operator — the Flink Top-N shape
  * (rank-filter per key) that Spark normally executes as a windowed
  * row_number: shuffle + FULL SORT of every partition + filter. This
  * operator keeps a bounded heap per key instead: O(n log k) with k
  * rows of state per key, no sort buffers, no spill — the difference
  * between sorting 100 TB and heap-scanning it (SURVEY §5).
  *
  * Since round 2 the plan is TWO-PHASE, like a partial aggregate:
  * [[TopKPartialExec]] heaps per key per input partition BEFORE the
  * exchange, so at most keys×k rows per partition enter the shuffle
  * (top-k is a semigroup: topK(A ∪ B) = topK(topK(A) ∪ topK(B))) —
  * on 100 TB the shuffle moves the candidate set, not the table.
  * [[TopKPerGroupExec]] then merges under a clustered distribution.
  *
  * The complete custom-operator stack: logical node → [[TopKStrategy]]
  * → partial + final exec, registered via GraftExtensions (or
  * per-session through `spark.experimental.extraStrategies`, which
  * [[TopKPerGroup.apply]] wires automatically).
  */
case class TopKPerGroup(
    groupBy: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

object TopKPerGroup {
  /** User-facing API: top `k` rows per `keys` group in `order`. */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val sortOrders = order.map(c => ColumnBridge.catalystExpression(c) match {
      case s: SortOrder => s
      case e            => SortOrder(e, Ascending)
    })
    ColumnBridge.ofRows(spark, new TopKPerGroup(
      keys.map(ColumnBridge.catalystExpression), sortOrders, k,
      ColumnBridge.planOf(df)))
  }

  /** One streaming heap pass: top `k` rows per key of `it`. Shared by
    * the partial (map-side) and final (merge) phases. The heap is a
    * max-heap whose root is the WORST kept row, evicted whenever a
    * better row arrives. */
  private[plans] def heapPass(
      it: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      ordering: BaseOrdering,
      k: Int): Iterator[InternalRow] = {
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    it.foreach { row =>
      val key = keyProj(row)
      heaps.get(key) match {
        case None =>
          val h = mutable.PriorityQueue.empty[InternalRow](ordering)
          h += row.copy()
          heaps.put(key.copy(), h)
        case Some(h) =>
          if (h.size < k) h += row.copy()
          else if (ordering.compare(row, h.head) < 0) {
            h.dequeue(); h += row.copy()
          }
      }
    }
    heaps.valuesIterator.flatMap(_.iterator)
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k,
        TopKPartialExec(g, o, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Map-side phase: bounded heaps per key WITHIN each input partition,
  * no distribution requirement — runs before the exchange and caps
  * what the shuffle carries at keys×k rows per partition. The
  * `shuffleRows` metric is the operator's scale story made visible
  * (TopKSpec asserts on it). */
case class TopKPartialExec(
    groupBy: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "shuffleRows" -> SQLMetrics.createMetric(sparkContext,
      "rows entering the top-k exchange"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val orderLocal = order
    val groupLocal = groupBy
    val childOutput = child.output
    val metric = longMetric("shuffleRows")
    child.execute().mapPartitions { it =>
      val ordering = RowOrdering.create(orderLocal, childOutput)
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      TopKPerGroup.heapPass(it, keyProj, ordering, kLocal).map { r =>
        metric.add(1L); r
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPartialExec =
    copy(child = c)
}

/** Merge phase: requires clustering on the group keys (Spark inserts
  * the hash exchange above the partial), then one more heap pass
  * merges the per-partition candidates into the exact per-key top-k. */
case class TopKPerGroupExec(
    groupBy: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupBy) :: Nil
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val orderLocal = order
    val groupLocal = groupBy
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val ordering = RowOrdering.create(orderLocal, childOutput)
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      TopKPerGroup.heapPass(it, keyProj, ordering, kLocal)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}
