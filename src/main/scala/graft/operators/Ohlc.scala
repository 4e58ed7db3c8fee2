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

  /** Fine-resolution bars — get_stock_fine_resolution
    * (load_yfinance_data.py:137-141): same aggregate at an arbitrary
    * tumbling resolution ("15 minutes", "1 hour", …). Identical shuffle
    * shape; `window()` buckets inside the same single hash-aggregate.
    */
  def bars(
      events: DataFrame,
      resolution: String,
      entity: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    events
      .repartition(col(entity))
      .groupBy(col(entity), window(col(tsCol), resolution).as("w"))
      .agg(
        min_by(col(valueCol), col(tsCol)).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), col(tsCol)).as("close"),
        count(lit(1)).as("volume"))
      .select(col(entity), col("w.start").as("bucket"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))

  /** Gap-fill over a continuous per-entity date spine with
    * last-observation-carried-forward — the reference's continuous date
    * axis (sectors.py:207-221 _add_date_range) as a data operator: each
    * entity's [min(d), max(d)] range explodes into one row per day
    * (sequence(), map-side — the spine is never shuffled separately), the
    * sparse series left-joins on, and missing values fill from the last
    * non-null observation via one per-entity window.
    */
  def fillForward(
      series: DataFrame,
      valueCols: Seq[String],
      entity: String = "user_id",
      dateCol: String = "d"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spine = series
      .groupBy(col(entity))
      .agg(min(col(dateCol)).as("__d0"), max(col(dateCol)).as("__d1"))
      .select(col(entity),
        explode(expr("sequence(__d0, __d1, interval 1 day)")).as(dateCol))
    val w = Window.partitionBy(col(entity)).orderBy(col(dateCol))
    val filled = valueCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c))
    spine
      .join(series, Seq(entity, dateCol), "left")
      .select(col(entity) +: col(dateCol) +: filled: _*)
  }
}
