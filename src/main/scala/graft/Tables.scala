package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata layout
  * (`<dir>/<table>.parquet`). Schemas come from the files; column pruning
  * and predicate pushdown are left to Catalyst — callers `select`/`filter`
  * declaratively and the scan narrows itself.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events.ts` has shipped in three physical encodings across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's reader rejects unless
    * `nanosAsLong` maps it to a raw long), TIMESTAMP(MICROS), and a plain
    * int64 of epoch-nanos. Setting the legacy conf is harmless for the
    * non-nanos encodings (it only affects NANOS columns), so it stays on
    * unconditionally; [[graft.SparkEntry]]'s events helper then normalizes
    * whatever dtype actually loaded to TIMESTAMP_NTZ.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
