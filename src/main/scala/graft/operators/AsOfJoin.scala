package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row picks up the most recent right-side values with
  * `right.ts <= left.ts` for the same key — how the reference aligns sparse
  * share-snapshot dates with dense daily price dates
  * (stock_data_pipeline/sector.py:86-112 joins on exact date only because its
  * snapshots are daily; at-or-before is the general semantics).
  *
  * Implementation is union + running `last(ignoreNulls)` window rather than a
  * range join: both sides shuffle ONCE on the key and are sorted once, giving
  * O(n log n) per partition with no per-row range probe and no candidate-pair
  * blowup — the shape that survives a 100× scale-up. Ties (equal ts) order
  * the right row first, so same-instant snapshots are visible.
  *
  * `rightVals` must not collide with left column names.
  */
object AsOfJoin {
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      rightVals: Seq[String]): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right
      .select((key +: tsCol +: rightVals).map(col): _*)
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.where(col("__side") === 1).drop("__side")
  }
}
