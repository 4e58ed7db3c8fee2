package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: lay documents out along a deterministic
  * order and cut the token stream into fixed-budget sequences — the
  * packing pass that turns a curated corpus into pre-training examples.
  *
  * The core primitive is a DISTRIBUTED PREFIX SUM. A naive
  * `sum().over(Window.orderBy(ord))` collapses the whole corpus into ONE
  * partition (Spark plans a global window as a single-task sort) — the
  * classic scale trap for cumulative metrics. Instead, the standard
  * two-level scan: rows chunk by `ord div chunkSize`; per-chunk totals
  * (one partial-aggregated groupBy over #chunks rows) get their own
  * running sum in a single tiny window (#chunks ≈ corpus/chunkSize rows —
  * at 100 TB with 1M-doc chunks that is ~10⁵ rows, trivially one task),
  * broadcast back, and each chunk computes its interior prefix in
  * parallel under a chunk-partitioned window. Every stage is bounded:
  * nothing ever sorts the corpus globally.
  */
object Packing {

  /** Exclusive prefix sum of `valueCol` along ascending `ordCol` (distinct
    * integral values), added as column `prefix`. Deterministic; scale-safe
    * per the two-level scan above.
    */
  def prefixSum(df: DataFrame, ordCol: String, valueCol: String,
                chunkSize: Long = 1L << 20, tieCol: Option[String] = None): DataFrame = {
    // integral `div`, not `/`: float division of longs loses exactness
    // past 2^53 (and Spark's `/` on longs is a double divide)
    val chunked = df.withColumn("__chunk", expr(s"cast($ordCol as long) div ${chunkSize}L"))
    val chunkTotals = chunked
      .groupBy(col("__chunk"))
      .agg(sum(col(valueCol).cast("long")).as("__chunk_sum"))
    // one window over #chunks rows — the ONLY serial step, and it is tiny
    val chunkOffsets = chunkTotals
      .withColumn("__chunk_offset",
        coalesce(sum(col("__chunk_sum")).over(
          Window.orderBy(col("__chunk")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__chunk"), col("__chunk_offset"))
    val inChunk = Window.partitionBy(col("__chunk"))
      .orderBy(col(ordCol) +: tieCol.map(col).toSeq: _*)
    chunked
      .join(broadcast(chunkOffsets), "__chunk")
      .withColumn("prefix",
        col("__chunk_offset") +
          coalesce(sum(col(valueCol).cast("long")).over(
            inChunk.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__chunk", "__chunk_offset")
  }

  /** Pack documents into fixed-`budget` token sequences along ascending
    * `ordCol`: each doc starts at its exclusive token prefix; `seq_id` is
    * the sequence its first token lands in, `seq_offset` the position
    * inside it. Long docs may straddle sequence boundaries (the standard
    * concat-then-chunk pre-training layout, where examples are cut from
    * the packed stream regardless of doc edges).
    */
  def packSequences(docs: DataFrame, budget: Long,
                    ordCol: String = "doc_id", textCol: String = "text",
                    chunkSize: Long = 1L << 20): DataFrame = {
    val withToks = docs.select(col(ordCol),
      TextAnalysis.tokenCount(textCol).as("n_tokens"))
    prefixSum(withToks, ordCol, "n_tokens", chunkSize)
      .select(col(ordCol), col("n_tokens"),
        expr(s"prefix div ${budget}L").as("seq_id"),
        pmod(col("prefix"), lit(budget)).cast("long").as("seq_offset"))
  }

  /** Deterministic GLOBAL SHUFFLE + fixed-budget shard assignment — the
    * "shuffle the curated corpus, cut it into training shards" pass. The
    * order is md5 of the id: uniform, reproducible in any engine (no RNG
    * state), and stable across runs and cluster sizes — re-running the
    * job, or running it on 10× the executors, assigns every document the
    * same (shard, offset). The leading 60 bits of the hash give the
    * integral order key; ties (≈ n²/2⁶⁰) break on the id itself, so the
    * layout is total-ordered even under collisions.
    *
    * The prefix sum is the same two-level scan as [[packSequences]], but
    * chunked on the hash's HIGH bits: hash values are uniform over
    * [0, 2⁶⁰), so value-range chunks are balanced by construction —
    * `2⁶⁰ / chunkSpan` chunks regardless of corpus size (raise the bit
    * count for more parallel chunks at larger corpora; nothing else
    * changes).
    */
  def shardAssign(docs: DataFrame, budget: Long,
                  idCol: String = "doc_id", textCol: String = "text",
                  chunkSpan: Long = 1L << 52): DataFrame = {
    val withOrd = docs.select(col(idCol),
      TextAnalysis.tokenCount(textCol).as("n_tokens"),
      conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
        .cast("long").as("__ord"))
    prefixSum(withOrd, "__ord", "n_tokens", chunkSpan, tieCol = Some(idCol))
      .select(col(idCol), col("n_tokens"),
        expr(s"prefix div ${budget}L").as("shard_id"),
        pmod(col("prefix"), lit(budget)).cast("long").as("shard_offset"))
  }
}
