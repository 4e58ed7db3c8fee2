package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval joins without a range cross product. Spark plans a
  * `p.key = i.key AND p.ts BETWEEN i.start AND i.end` join as an equi-join
  * on key with the range as a residual filter — correct, but a hot key
  * degenerates to |points(key)| × |intervals(key)| row pairs inside one
  * task. The standard fix is TIME-BUCKET BLOCKING: intervals explode to the
  * fixed-width buckets they overlap, points compute their single bucket,
  * and the join runs as a plain equi-join on (key, bucket) with the exact
  * range test as a cheap residual. Each point lives in EXACTLY one bucket,
  * so containment matches are found exactly once — no dedup stage.
  *
  * Scale: the exchange is keyed by (key, bucket), so a hot key's pairs
  * spread over its time range instead of one task, and AQE can split any
  * residual bucket skew. Interval fan-out is `duration/bucketSec + 1` rows
  * — pick `bucketSec` near the TYPICAL interval length so fan-out stays
  * O(1) while buckets hold few intervals.
  */
object IntervalJoin {

  /** Join `points` (epoch-seconds column `tsSecCol`) to the `intervals`
    * rows of the same `keys` whose `[startSecCol, endSecCol]` (inclusive
    * both ends) contain the point. Emits every `points` column plus every
    * non-key `intervals` column; a point contained by several intervals
    * emits one row per containing interval.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], tsSecCol: String,
                      startSecCol: String, endSecCol: String,
                      bucketSec: Long = 3600L): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val iv = intervals.withColumn("__bkt",
      explode(expr(
        s"sequence(floor($startSecCol / $bucketSec.0D), floor($endSecCol / $bucketSec.0D))")))
    val pt = points.withColumn("__bkt",
      expr(s"floor($tsSecCol / $bucketSec.0D)"))
    pt.join(iv, keys :+ "__bkt")
      .where(col(tsSecCol) >= col(startSecCol) && col(tsSecCol) <= col(endSecCol))
      .drop("__bkt")
  }
}
