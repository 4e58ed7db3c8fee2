package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher) over any number of
    * per-query rankings — the standard way to combine a lexical (BM25) and
    * a dense (ANN) retrieval pass into one hybrid result list without
    * score calibration: `rrf(d) = Σ_lists 1/(c + rank_list(d))`, summing
    * only over the lists that ranked `d`.
    *
    * Each input is (qIdCol, idCol, rankCol) with rank 1-based within its
    * query. Per-list terms are rounded to 12 decimals and accumulated in
    * decimal (the Fns.exactSum idiom) so the fused score is
    * partition-order-independent and oracle-reproducible.
    *
    * Scale shape: every input ranking is already k·|queries| rows (each
    * retrieval pass bounded its own output), so the union + groupBy here
    * shuffles model-sized data no matter the corpus size; the final
    * per-query cut runs on the bounded-heap GroupTopK operator.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 10, c: Int = 60,
              qIdCol: String = "q_id", idCol: String = "doc_id",
              rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val fused = rankings
      .map(_.select(col(qIdCol), col(idCol),
        round(lit(1.0) / (lit(c.toDouble) + col(rankCol).cast("double")), 12)
          .cast("decimal(28,12)").as("__term")))
      .reduce(_ unionByName _)
      .groupBy(col(qIdCol), col(idCol))
      .agg(round(sum(col("__term")).cast("double"), 6).as("rrf_score"))
    graft.plans.GroupTopK.topKPerKey(
      fused, Seq(qIdCol), Seq(col("rrf_score").desc, col(idCol).asc), k)
  }

  /** Offline ranking evaluation — nDCG@k, MRR and precision@k per query,
    * the metrics a retrieval pipeline reports before its index ships.
    *
    * `ranking` is (qIdCol, idCol, rankCol), rank 1-based, at most `k` rows
    * per query; `relevance` is (qIdCol, idCol, relCol) with integer grades
    * (≥1 = relevant; absent pairs are grade 0). DCG uses the standard
    * exponential gain `(2^rel − 1)/log2(rank + 1)`; the ideal DCG ranks
    * each query's OWN relevance grades descending, cut at `k` by the
    * bounded-heap GroupTopK (the relevance table can be corpus-sized — the
    * ideal list must never sort it globally). Per-position terms are
    * rounded to 12 decimals and accumulated in decimal so both sums are
    * partition-order-independent; queries with no relevant documents
    * anywhere score ndcg = mrr = 0.
    *
    * Scale shape: one bounded-heap pass over `relevance` (k rows per query
    * survive), one broadcast-sized join against the k·|queries|-row
    * ranking, three model-sized aggregates. Nothing corpus-sized shuffles.
    */
  def rankEval(ranking: DataFrame, relevance: DataFrame, k: Int = 10,
               qIdCol: String = "q_id", idCol: String = "doc_id",
               rankCol: String = "rank", relCol: String = "rel"): DataFrame = {
    val gain: Column => Column = rel => pow(lit(2.0), rel.cast("double")) - lit(1.0)
    val term = (rel: Column, rank: Column) =>
      round(gain(rel) / log2(rank.cast("double") + lit(1.0)), 12)
        .cast("decimal(28,12)")
    val joined = ranking
      .join(relevance, Seq(qIdCol, idCol), "left")
      .withColumn("__rel", coalesce(col(relCol), lit(0)))
    val dcg = joined.groupBy(col(qIdCol)).agg(
      sum(term(col("__rel"), col(rankCol))).cast("double").as("__dcg"),
      min(when(col("__rel") > 0, col(rankCol))).as("__first_rel"),
      (sum(when(col("__rel") > 0, 1).otherwise(0)) / lit(k.toDouble))
        .as("precision"))
    val idealCut = graft.plans.GroupTopK.topKPerKey(
      relevance.where(col(relCol) > 0), Seq(qIdCol),
      Seq(col(relCol).desc, col(idCol).asc), k)
    val idcg = idealCut
      .withColumn("__irank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(qIdCol)).orderBy(col(relCol).desc, col(idCol).asc)))
      .groupBy(col(qIdCol))
      .agg(sum(term(col(relCol), col("__irank"))).cast("double").as("__idcg"))
    dcg.join(idcg, Seq(qIdCol), "left")
      .select(col(qIdCol),
        coalesce(round(col("__dcg") / nullif(col("__idcg"), lit(0.0)), 6),
          lit(0.0)).as("ndcg"),
        coalesce(round(lit(1.0) / col("__first_rel").cast("double"), 6),
          lit(0.0)).as("mrr"),
        col("precision"))
  }
}
