package graft.plans

import java.util.{PriorityQueue => JPriorityQueue}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{BooleanType, ByteType, DateType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, TimestampNTZType, TimestampType}

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
    *
    * `maxKeysPerTask` bounds the partial stage's in-memory key map: once a
    * map-side task has seen that many distinct keys, rows for NEW keys pass
    * through to the shuffle unreduced (always correct — the final stage
    * decides) while already-tracked keys keep combining. Memory is bounded
    * at maxKeysPerTask·k rows per task no matter the key cardinality; the
    * trade is shuffle volume, never correctness or completion.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int,
                 maxKeysPerTask: Int = 1 << 20): DataFrame = {
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
      GroupTopKPlan(keyExprs, sortOrders, k, df.queryExecution.analyzed, maxKeysPerTask))
  }
}

case class GroupTopKPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    maxKeysPerTask: Int = 1 << 20) extends UnaryNode {
  require(k > 0, "k must be positive")
  require(maxKeysPerTask > 0, "maxKeysPerTask must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopKPlan =
    copy(child = newChild)
}

object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKPlan(keys, order, k, child, maxKeys) =>
      val partial = GroupTopKExec(keys, order, k, partial = true, maxKeys, planLater(child))
      GroupTopKExec(keys, order, k, partial = false, maxKeys, partial) :: Nil
    case _ => Nil
  }
}

/** Two execution modes:
  *
  *   - `partial` (map side): bounded heap map — ≤ k rows per key leave the
  *     task, at most `maxKeys` keys tracked; overflow keys pass through
  *     unreduced so memory stays bounded at any key cardinality.
  *   - final (reduce side): requires the child CLUSTERED by key AND SORTED
  *     by (key, order) — EnsureRequirements inserts Spark's external,
  *     spill-capable SortExec above the exchange — and then emits the
  *     first k rows of each key group in one O(1)-memory streaming pass.
  *     The sort input is the partials' bounded output (≈ k·|keys|), never
  *     the full fact table; this is the same partial/sorted-final shape as
  *     Spark's own WindowGroupLimit, with a hash heap instead of a sorted
  *     partial on the map side.
  */
case class GroupTopKExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    maxKeys: Int,
    child: SparkPlan) extends UnaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = child.output

  // Spark-UI observability, the part of a custom operator that pays off in
  // production triage: output rows per stage, plus how often the partial's
  // bounded key map overflowed (high passThrough = raise maxKeysPerTask or
  // pre-partition — the operator stays correct either way, but the shuffle
  // carries unreduced rows)
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "passThroughRows" ->
      SQLMetrics.createMetric(sparkContext, "rows passed through on key-map overflow"))

  // ---- whole-stage codegen (final stage only) --------------------------
  //
  // The final stage is a stateful streaming pass over key-sorted input —
  // exactly the shape whole-stage codegen fuses well: the group-change test
  // and the ≤ k emit compile into the same loop that SortExec produces
  // into, so rows flow sorter → group-limit → downstream with no iterator
  // hop or row materialization in between. The hash-heap partial stage
  // stays interpreted (a heap per key has no codegen template); it ends the
  // child's pipeline anyway, being the stage boundary before the exchange.

  /** Key types whose compare/copy templates are generated below; anything
    * else (decimal, struct, array, …) falls back to the interpreted path.
    */
  private def codegenKeyType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  override def supportCodegen: Boolean =
    !partial && keys.forall(e => codegenKeyType(e.dataType))

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  override protected def doProduce(ctx: CodegenContext): String =
    child.asInstanceOf[CodegenSupport].produce(ctx, this)

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String = {
    val boundKeys = BindReferences.bindReferences(keys, child.output)
    ctx.currentVars = input
    val keyEvals = boundKeys.map(_.genCode(ctx))
    val numOut = metricTerm(ctx, "numOutputRows")
    val seen = ctx.addMutableState(CodeGenerator.JAVA_INT, "gtkSeen")
    val inited = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "gtkInited")
    val prevs = boundKeys.map { e =>
      (ctx.addMutableState(CodeGenerator.javaType(e.dataType), "gtkPrev"),
        ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "gtkPrevNull"))
    }
    val same = boundKeys.zip(keyEvals).zip(prevs).map { case ((e, ev), (pv, pn)) =>
      val eq = ctx.genEqual(e.dataType, ev.value, pv)
      s"(($pn && ${ev.isNull}) || (!$pn && !${ev.isNull} && ($eq)))"
    }.mkString(" && ")
    val saves = boundKeys.zip(keyEvals).zip(prevs).map { case ((e, ev), (pv, pn)) =>
      // UTF8String points into the sorter's reused row buffer — copy it
      val copied = e.dataType match {
        case StringType => s"${ev.value}.clone()"
        case _ => ev.value
      }
      s"""$pn = ${ev.isNull};
         |if (!$pn) $pv = $copied;""".stripMargin
    }.mkString("\n")
    val sameVar = ctx.freshName("sameGroup")
    s"""
       |${keyEvals.map(_.code).mkString("\n")}
       |boolean $sameVar = $inited && ($same);
       |if (!$sameVar) {
       |  $inited = true;
       |  $seen = 0;
       |  $saves
       |}
       |$seen += 1;
       |if ($seen <= $k) {
       |  $numOut.add(1);
       |  ${consume(ctx, input)}
       |}
     """.stripMargin
  }

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(keys.map(SortOrder(_, Ascending)) ++ order)

  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else keys.map(SortOrder(_, Ascending)) ++ order

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val maxTracked = maxKeys
    val childOutput = child.output
    val numOutputRows = longMetric("numOutputRows")
    val passThroughRows = longMetric("passThroughRows")
    if (partial) {
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
        new Iterator[InternalRow] {
          private var passThrough: InternalRow = null
          private var flush: Iterator[UnsafeRow] = null

          private def advance(): Unit = {
            while (passThrough == null && flush == null) {
              if (!it.hasNext) {
                import scala.jdk.CollectionConverters._
                flush = heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
              } else {
                val row = it.next()
                val uRow = row match {
                  case u: UnsafeRow => u
                  case other => toUnsafe(other)
                }
                val key = keyProj.apply(uRow)
                var heap = heaps.get(key)
                if (heap == null) {
                  if (heaps.size() >= maxTracked) {
                    // key-map full: ship this row unreduced, keep memory flat
                    passThrough = uRow
                  } else {
                    heap = new JPriorityQueue[UnsafeRow](limit, cmp)
                    heaps.put(key.copy(), heap)
                    heap.add(uRow.copy())
                  }
                } else if (heap.size < limit) {
                  heap.add(uRow.copy())
                } else if (ord.compare(uRow, heap.peek()) < 0) {
                  heap.poll()
                  heap.add(uRow.copy())
                }
              }
            }
          }

          override def hasNext: Boolean = {
            if (passThrough == null && (flush == null || !flush.hasNext)) {
              if (flush != null) return false
              advance()
            }
            passThrough != null || flush.hasNext
          }

          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            numOutputRows += 1
            if (passThrough != null) {
              passThroughRows += 1
              val r = passThrough; passThrough = null; r
            } else flush.next()
          }
        }
      }
    } else {
      // sorted streaming final: first k rows of each key group
      child.execute().mapPartitions { it =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        var prevKey: UnsafeRow = null
        var seen = 0
        it.flatMap { row =>
          val uRow = row match {
            case u: UnsafeRow => u
            case other => toUnsafe(other)
          }
          val key = keyProj.apply(uRow)
          if (prevKey == null || key != prevKey) {
            prevKey = key.copy()
            seen = 0
          }
          seen += 1
          if (seen <= limit) { numOutputRows += 1; Iterator.single(uRow) }
          else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)
}
