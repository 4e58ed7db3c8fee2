package graft

import graft.plans.{GraftFunctions, GroupTopKStrategy, RewriteWindowTopK}
import org.apache.spark.sql.SparkSession

/** One-call enablement of every graft extension on a live session:
  * SQL functions (graft_dot/graft_minhash/graft_simhash), the GroupTopK
  * planner strategy, and the window-top-k rewrite rule. For sessions built
  * from config, `spark.sql.extensions=graft.plans.GraftExtensions` does the
  * same at construction time.
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
