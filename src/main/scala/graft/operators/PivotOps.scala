package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long→wide reshaping — the reference pivots holdings (ticker, shares) rows
  * into a date × ticker_shares wide table
  * (stock_data_pipeline/sector.py:156-173) and unions snapshots whose column
  * sets drift as tickers enter/leave the index (sector.py:70-84
  * add_missing_columns).
  */
object PivotOps {

  /** Pivot with a DECLARED vocabulary: passing `values` explicitly skips the
    * extra distinct-collect job Spark otherwise runs, so the plan is a single
    * hash-aggregate — one shuffle on the key. At 100 TB the vocabulary
    * (event types / tickers) is catalog metadata, not something to re-derive
    * from the data each run.
    */
  def pivotAgg(
      df: DataFrame,
      key: String,
      pivotCol: String,
      values: Seq[String],
      agg: Column): DataFrame =
    df.groupBy(col(key)).pivot(pivotCol, values).agg(agg)

  /** Union snapshots whose wide schemas drifted: missing columns become NULL
    * (the reference's ALTER TABLE ADD COLUMN ... NULL path, sector.py:70-84).
    */
  def unionEvolved(snapshots: Seq[(String, DataFrame)]): DataFrame =
    snapshots
      .map { case (tag, df) => df.withColumn("snapshot", lit(tag)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
}
