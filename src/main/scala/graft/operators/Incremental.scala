package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental-append compatibility: keep only incoming rows strictly newer
  * than what the target table already holds — the reference's
  * `check_table_append_compatibility` (stock_data_pipeline/functions.py:23-39)
  * and `get_stock_history_latest_date` (ticker.py:26-31), generalized from
  * one-table-per-ticker to a keyed table.
  *
  * The per-key MAX(ts) aggregate is one row per key — tiny relative to the
  * incoming fact table — so it broadcasts: the big side is never shuffled,
  * and the filter happens map-side. At 1000 executors this is a metadata-
  * sized exchange regardless of fact volume.
  */
object Incremental {
  def newerThanExisting(
      existing: DataFrame,
      incoming: DataFrame,
      key: String,
      tsCol: String): DataFrame = {
    val latest = existing.groupBy(col(key)).agg(max(col(tsCol)).as("__latest_ts"))
    incoming
      .join(broadcast(latest), Seq(key), "left")
      .where(col("__latest_ts").isNull || col(tsCol) > col("__latest_ts"))
      .drop("__latest_ts")
  }

  /** Global (un-keyed) variant — the literal reference behavior for a single
    * ticker table: filter rows after the table-wide latest date.
    */
  def newerThanGlobal(existing: DataFrame, incoming: DataFrame, tsCol: String): DataFrame = {
    val latest = existing.agg(max(col(tsCol)).as("__latest_ts"))
    incoming
      .join(broadcast(latest))
      .where(col("__latest_ts").isNull || col(tsCol) > col("__latest_ts"))
      .drop("__latest_ts")
  }
}
