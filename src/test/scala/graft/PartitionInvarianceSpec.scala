package graft

/** The bit-stability claim, asserted: because every float aggregation
  * accumulates in decimal (Fns.exactSum / dotExact) and every division is
  * guarded and rounded identically, results must be IDENTICAL — not merely
  * close — under any shuffle-partition count. A distributed double sum
  * would fail this (merge order changes the low bits, and a rounded 6th
  * decimal eventually flips); these queries must not.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val sensitive = Seq(
    "q1_pricing_summary", // 8 decimal-accumulated aggregates
    "q_weighted_price",   // sum-product ratio
    "q_zscore",           // variance from exact sums
    "q_sector_price",     // as-of + ratio chain
    "q_quality_score",    // decimal-blended score
    "q_dedup_embedding",  // decimal-exact cosine over the pair grid
    "q_pack_sequences",   // two-level prefix sum
    "q_robust_stats",     // driver-walked radix bisection (exact long counts)
    "q_winsorize",        // bisection bounds + decimal-exact clipped mean
    "q_chi_square",       // decimal-summed (o-e)^2/e terms
    "q_mannwhitney",      // exact half-integer rank sums + decimal tie term
    "q_time_between",     // scale-0 decimal gap sum, quantileCont median
    "q_market_basket",    // integer pair counts -> double ratios
    "q_pca_project",      // fixed-point treeAggregate moments
    "q_rrf_fusion",       // decimal-summed 1/(c+rank) over two rankings
    "q_rank_eval",        // decimal-summed DCG/IDCG position terms
    "q_pagerank",         // 5 iterations of decimal-summed contributions
    "q_weighted_sample",  // scan-level A-ES keys, global bounded top-k
    "q18_big_orders",     // decimal quantity sums gate the join
    "q_components",       // pure min propagation on long ids, no numerics
    "q_concurrency",      // two-level prefix sum over boundary deltas
    "q_gini",             // rank-weighted decimal moments
    "q_zipf_slope",       // round-12 decimal OLS moments over ln terms
    "q_forecast_eval",    // decimal error moments + final IEEE sqrt
    "q_bfs_hops",         // integer min-distance propagation
    "q15_top_supplier",   // max over decimal-summed revenue
    "q_survivorship")     // single-long argmax key, integer aggregates

  test("sensitive queries return identical rows at 3 vs 32 shuffle partitions") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def run(parts: String): Map[String, Set[Seq[Any]]] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try sensitive.map { q =>
        q -> SparkEntry.queries(q)(spark, sfDir).collect().map(_.toSeq).toSet
      }.toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val at3 = run("3")
    val at32 = run("32")
    sensitive.foreach { q =>
      assert(at3(q) === at32(q), s"$q differs across partition counts")
      assert(at3(q).nonEmpty, s"$q returned nothing")
    }
  }
}
