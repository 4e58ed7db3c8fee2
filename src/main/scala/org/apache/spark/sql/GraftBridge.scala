package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge into the `sql`-private Expression ⇄ Column conversions so graft's
  * custom catalyst expressions (graft.plans.*) can be used through the
  * public Column API. Same approach Spark extension libraries use.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Lazy wrapper conversion — fine when the expression feeds a standard
    * Dataset operator (the analyzer finishes the conversion there).
    */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER catalyst conversion. Required when the expression is embedded in
    * a custom LogicalPlan node: the analyzer does not descend into unknown
    * nodes to convert leftover ColumnNodeExpression wrappers, which are not
    * serializable and would blow up at task serialization.
    */
  def catalystExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)

  /** DataFrame from a (possibly unresolved) logical plan — runs the full
    * analyzer, so UnresolvedAttribute children resolve against the child.
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Free the blocks behind a (local)checkpointed DataFrame.
    * `Dataset.unpersist` only uncaches CacheManager entries and is a
    * SILENT NO-OP for checkpoint-backed datasets (their persistence lives
    * on the underlying RDD) — iterative loops that materialize a frontier
    * per round must release the superseded round through the RDD handle or
    * executor storage grows by one frontier per iteration.
    */
  def unpersistCheckpointed(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ =>
    }

  /** RDD ids behind a (local)checkpoint-backed DataFrame — lets the
    * between-queries state reaper distinguish a process-lived memoized
    * frame's blocks from a finished query's garbage.
    */
  def checkpointRddIds(df: DataFrame): Seq[Int] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }

  /** Reset the context's checkpoint directory (SparkContext exposes set but
    * no unset). Lets a spec exercise the reliable-checkpoint mode of
    * graft.Graft.materialize and then restore local-checkpoint behavior
    * for the suites that follow in the shared test session.
    */
  def clearCheckpointDir(spark: SparkSession): Unit =
    spark.sparkContext.checkpointDir = None
}
