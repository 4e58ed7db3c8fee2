package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
