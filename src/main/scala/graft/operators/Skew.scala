package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew mitigation. AQE's skew-join handling (on by default) is the first
  * line of defense; these helpers are for the cases it doesn't reach —
  * broadcast-ineligible dimension joins against pathologically hot keys,
  * and aggregations whose single hot key saturates one reducer.
  */
object Skew {

  /** Salted equi-join of a skewed fact table against a dimension: the fact
    * side gets a deterministic per-row salt in [0, salts); the dimension is
    * replicated `salts` times; the join key becomes (key, salt). A hot fact
    * key now spreads over `salts` reducers at the cost of a `salts`×
    * dimension replication — the classic trade when the dimension is too
    * big to broadcast but far smaller than the fact.
    *
    * Row-deterministic salt (hash of the whole fact row, not rand()):
    * re-runs and retried tasks produce identical placement.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn(
      "__salt", pmod(xxhash64(struct(fact.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val saltedDim = dim
      .withColumn("__salt", explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedFact
      .join(saltedDim, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Two-phase salted aggregation: partial aggregate on (key, salt), final
    * on key. For algebraic aggregates Spark's map-side partial aggregation
    * usually makes this unnecessary; it matters when the partial combine is
    * defeated (high-cardinality composite values, collect-style aggregates).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame =
    df.withColumn(
        "__salt", pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol).cast("decimal(28,6)")).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).cast("double").as(s"sum_$valueCol"))

  /** Plain per-entity running sum: ONE entity-partitioned ordered window —
    * the default shape for every per-entity time-series op here, and the
    * one place AQE can't help with skew: a window's partitionBy(key) frame
    * must see the whole key in one task, so a pathological key (one ticker
    * = 30% of raw ticks) serializes into a single straggler.
    */
  def runningSum(df: DataFrame, key: String, tsCol: String, valueCol: String,
                 outCol: String = "running"): DataFrame =
    df.withColumn(outCol,
      sum(col(valueCol)).over(Window.partitionBy(col(key)).orderBy(col(tsCol))))

  /** Two-stage bucketed running sum — the skew fallback for RAW per-entity
    * windows over un-pre-aggregated streams (SURVEY §5's residual
    * exposure). The window is split on a time bucket that is a MONOTONE
    * function of the order column (default: the calendar day of `tsCol`),
    * so prefix semantics survive the split:
    *
    *  stage 1 — the data-sized window runs per (key, bucket): a hot key's
    *    rows now spread over its buckets instead of serializing one task;
    *  stage 2 — per-(key, bucket) totals (a partial-combined aggregate,
    *    bucket-count rows per key) get a prefix sum over buckets — a
    *    window whose partitions are bucket-counts, never row-counts;
    *  merge — offsets join back on (key, bucket), which stage 1's output
    *    is ALREADY hash-partitioned by, so the data-sized side does not
    *    re-shuffle; running = in-bucket partial + prior-bucket offset.
    *
    * Ties are safe: equal timestamps share a bucket (bucket is a function
    * of ts), and within a bucket the default RANGE frame gives tied rows
    * the same cumulative value, exactly like the plain window.
    */
  def runningSumBucketed(df: DataFrame, key: String, tsCol: String, valueCol: String,
                         outCol: String = "running",
                         bucket: Column => Column = to_date(_)): DataFrame = {
    val b = df.withColumn("__b", bucket(col(tsCol)))
    val partial = b.withColumn("__part",
      sum(col(valueCol)).over(
        Window.partitionBy(col(key), col("__b")).orderBy(col(tsCol))))
    val offsets = b.groupBy(col(key), col("__b"))
      .agg(sum(col(valueCol)).as("__tot"))
      .withColumn("__off", sum(col("__tot")).over(
        Window.partitionBy(col(key)).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(key), col("__b"), col("__off"))
    partial.join(offsets, Seq(key, "__b"))
      .withColumn(outCol, col("__part") + coalesce(col("__off"), lit(0)))
      .drop("__b", "__part", "__off")
  }

  /** Skew-aware running sum: measure the hottest key's share with one
    * partial-combined count (the same measure-then-plan move AQE makes
    * from shuffle stats), and take the two-stage bucketed window when it
    * reaches `skewThreshold`, the plain single-window plan otherwise —
    * the cheap plan for the common case, the parallel one for the
    * pathological key.
    */
  def runningSumAuto(df: DataFrame, key: String, tsCol: String, valueCol: String,
                     outCol: String = "running",
                     bucket: Column => Column = to_date(_),
                     skewThreshold: Double = 0.3): DataFrame = {
    val r = df.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")), sum(col("__n"))).head()
    val hotShare =
      if (r.isNullAt(0) || r.getLong(1) == 0L) 0.0
      else r.getLong(0).toDouble / r.getLong(1)
    if (hotShare >= skewThreshold)
      runningSumBucketed(df, key, tsCol, valueCol, outCol, bucket)
    else runningSum(df, key, tsCol, valueCol, outCol)
  }
}
