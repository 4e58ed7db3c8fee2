package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over the corpus — the BM25 ranking pass used to
  * mine training data against seed queries (and the classic counterpart to
  * the dense ANN family in [[Similarity]]).
  *
  * Scale shape: the corpus-sized aggregations (term frequency, document
  * length) are plain partial-aggregated groupBys; everything query-sized is
  * broadcast. The postings table is restricted to the QUERY vocabulary
  * before any join — a semi-join against a broadcast token list at the map
  * side of the tf aggregation's output — so the scoring join's left side is
  * |matching postings|, not |corpus vocabulary|. Per-query ranking runs on
  * the bounded-heap GroupTopK operator: the rank stage shuffles k rows per
  * query, never every scored document.
  */
object Retrieval {

  /** Top-`k` documents per query under BM25 (Robertson/Spärck Jones; the
    * `ln(1 + (N-df+0.5)/(df+0.5))` idf variant that stays positive).
    * Query terms are deduplicated (qtf = 1 — the web-mining convention for
    * short seed queries). Per-term contributions are rounded to 12 decimals
    * and accumulated in decimal so the sum is partition-order-independent
    * and oracle-reproducible (Fns.exactSum idiom).
    *
    * Output: (q_id, doc_id, score), an unordered top-k set per query.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75,
               textCol: String = "text", idCol: String = "doc_id",
               qIdCol: String = "q_id", qTextCol: String = "q_text"): DataFrame = {
    val toks = docs.select(col(idCol), explode(Dedup.tokens(textCol)).as("token"))
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    // N and avgdl in one corpus-count-sized aggregate (every doc has >= 1
    // token under the tokens() contract, so dl covers the corpus)
    val stats = broadcast(dl.agg(
      count(lit(1)).as("__n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("__avgdl")))
    val qTerms = queries.select(
      col(qIdCol), explode(array_distinct(Dedup.tokens(qTextCol))).as("token"))
    // postings restricted to the query vocabulary BEFORE df/scoring joins
    val hot = tf.join(broadcast(qTerms.select(col("token")).distinct()), "token")
    val dfq = broadcast(hot.groupBy(col("token")).agg(count(lit(1)).as("df")))
    val idf = log(lit(1.0) +
      (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("__avgdl")))
    val scored = hot
      .join(dl, idCol)
      .join(dfq, "token")
      .crossJoin(stats)
      .join(broadcast(qTerms), "token")
      .groupBy(col(qIdCol), col(idCol))
      .agg(round(sum(round(idf * tfNorm, 12).cast("decimal(28,12)"))
        .cast("double"), 6).as("score"))
    graft.plans.GroupTopK.topKPerKey(
      scored, Seq(qIdCol), Seq(col("score").desc, col(idCol).asc), k)
  }
}
