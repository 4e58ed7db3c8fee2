package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables: pre-shuffle a fact table ONCE at write time so every
  * subsequent equi-join/aggregation on the bucket key runs with zero
  * exchange. The 100 TB pattern: bucket `lineitem` and `orders` on the
  * order key at ingest; the daily join reads co-located buckets.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * merge-style reads skip the sort too).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planner sees the
    * compatible output partitionings and elides both exchanges.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
