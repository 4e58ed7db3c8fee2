package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Daily OHLCV bars per entity from tick-level events — the Spark
  * re-expression of the reference's per-ticker daily history ingestion
  * (stock_data_pipeline/load_yfinance_data.py:86-116, CollectDailyData).
  *
  * Single hash-aggregate: one shuffle on (entity, day). `min_by`/`max_by`
  * pick open/close without a sort or self-join, and partial aggregation
  * (map-side combine) means the shuffle carries one row per (entity, day)
  * per task — at 100 TB the shuffle volume is the bar count, not the tick
  * count.
  */
object Ohlc {
  def dailyBars(
      events: DataFrame,
      entity: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    events
      // Shuffle on the entity alone (not (entity, day)): hash-partitioning by
      // entity still satisfies the aggregate's clustering requirement, and
      // every downstream per-entity window (SMA, gaps, pct-change) then reuses
      // this one exchange instead of adding its own.
      .repartition(col(entity))
      .groupBy(col(entity), to_date(col(tsCol)).as("d"))
      .agg(
        min_by(col(valueCol), col(tsCol)).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), col(tsCol)).as("close"),
        count(lit(1)).as("volume"))
}
