package graft

import graft.plans.{GraftFunctions, GroupTopKStrategy, RewriteWindowTopK}
import org.apache.spark.sql.SparkSession

/** One-call enablement of every graft extension on a live session: the
  * SQL functions (graft_dot, graft_dot_int8, graft_quantize_int8,
  * graft_minhash, graft_simhash, graft_hyperplane_lsh, graft_winnow), the
  * GroupTopK planner strategy, and the window-top-k rewrite rule. For
  * sessions built from config, `spark.sql.extensions=graft.plans
  * .GraftExtensions` does the same at construction time.
  */
object Graft {
  def enable(spark: SparkSession): Unit = {
    GraftFunctions.register(spark)
    if (!spark.experimental.extraStrategies.contains(GroupTopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupTopKStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(RewriteWindowTopK)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteWindowTopK
    }
  }
}
