package graft.plans

import java.util.{PriorityQueue => JPriorityQueue}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-group top-k as a first-class physical operator.
  *
  * The stock way to express "top k rows per key" is
  * `row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k`, which
  * SORTS every partition completely — O(n log n) over the full data, all of
  * it shuffled. This operator keeps a bounded heap per key instead:
  * partial top-k before the exchange (only ≤ k rows per key per input
  * partition are shuffled), final top-k after — O(n log k) compute and a
  * shuffle that carries k·|keys| rows no matter how large the input. The
  * difference is the whole game at 100 TB fact sizes.
  *
  * Wiring: [[GroupTopKPlan]] (logical) → [[GroupTopKStrategy]] (planner
  * strategy, injectable via GraftExtensions or
  * `spark.experimental.extraStrategies`) → two [[GroupTopKExec]] stages,
  * with EnsureRequirements inserting the key exchange between them.
  */
object GroupTopK {

  /** Top `k` rows per `keys` group under `order` (total order ⇒
    * deterministic result). Output rows are an unordered set.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    // idempotently make the planner aware of the custom node
    if (!spark.experimental.extraStrategies.contains(GroupTopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupTopKStrategy
    }
    // catalystExpression: custom plan nodes need the EAGER conversion — the
    // analyzer won't convert lazy ColumnNodeExpression wrappers inside them
    val sortOrders = order.map(c => GraftBridge.catalystExpression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    val keyExprs: Seq[Expression] = keys.map(n => GraftBridge.catalystExpression(df.col(n)))
    GraftBridge.ofRows(spark,
      GroupTopKPlan(keyExprs, sortOrders, k, df.queryExecution.analyzed))
  }
}

case class GroupTopKPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopKPlan =
    copy(child = newChild)
}

object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKPlan(keys, order, k, child) =>
      val partial = GroupTopKExec(keys, order, k, partial = true, planLater(child))
      GroupTopKExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class GroupTopKExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  // Memory: each task holds ≤ k rows per DISTINCT KEY SEEN IN ITS PARTITION.
  // For extreme key cardinality × large k this is the operator's bound —
  // size executors for (keys-per-partition × k × row width), or fall back
  // to the window formulation, which spills. The common analytics case
  // (bounded key space, small k) is exactly where the heap wins.
  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // max-heap under `ord`: head is the WORST of the current top-k,
      // evicted when a better row arrives
      val heaps = new java.util.HashMap[UnsafeRow, JPriorityQueue[UnsafeRow]]()
      val cmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = -ord.compare(a, b)
      }
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      it.foreach { row =>
        val uRow = row match {
          case u: UnsafeRow => u
          case other => toUnsafe(other)
        }
        val key = keyProj.apply(uRow)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new JPriorityQueue[UnsafeRow](limit, cmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.add(uRow.copy())
        } else if (ord.compare(uRow, heap.peek()) < 0) {
          heap.poll()
          heap.add(uRow.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)
}
