package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Output-cardinality gate for the quadratic pair generators (exact
  * cosine-threshold pairs, LSH-verified pairs, SemDeDup pairs, winnowing
  * overlap).
  *
  * A similarity threshold over a decorrelated corpus makes the pair
  * OUTPUT Θ(n²) by geometry, not by plan defect: at d = 64 the cosine
  * noise floor has σ = 1/√d = 0.125, so τ = 0.4 sits 3.2σ out and a
  * constant fraction of ALL pairs clears it (measured on the scale rungs:
  * the exact τ = 0.4 pair set grew 920 → 9,618,218 when the corpus grew
  * 100×). Every generator's plan stays sublinear in its own output — but
  * without a gate a 100 TB run would happily materialize an
  * astronomically large pair table before anyone noticed. This is the
  * same fail-loudly-past-a-config-cap discipline as
  * `spark.graft.quantiles.maxGroups` and `spark.graft.ann.maxBatchQueries`:
  * estimate the output BEFORE producing it and abort with an actionable
  * message instead of melting the cluster.
  *
  * Two tiers, so small corpora never pay anything beyond one count:
  *
  *   1. FREE BOUND — output ≤ n(n−1)/2; when that bound already fits the
  *      cap, pass with zero extra work.
  *   2. CHEAP ESTIMATE — otherwise the caller-supplied estimator runs the
  *      generator's EXACT semantics on a deterministic hash sample of
  *      ~`spark.graft.pairs.estimateRows` rows and scales by 1/p² (pair
  *      survival needs both endpoints sampled, and hash sampling is
  *      independent of cluster structure, so the estimate is unbiased);
  *      the approximate generators are estimated by the exact τ-pair
  *      density — a superset of what they confirm — so the gate errs
  *      toward refusing, never toward melting.
  *
  * The estimate is sampling-noisy near the cap (±√(sampled pairs)); the
  * cap is a melt guard, not an exact quota.
  */
object PairGate {

  /** Hard cap on the estimated output-pair count; `0` disables the gate. */
  val CapKey = "spark.graft.pairs.maxOutput"

  /** Target row count of the tier-2 deterministic sample. */
  val RowsKey = "spark.graft.pairs.estimateRows"

  /** Default cap: ~5M (id_a, id_b, score) rows ≈ 120 MB — past that a
    * pair table stops being a reviewable artifact and starts being a
    * join input someone should have designed for explicitly.
    */
  val DefaultCap = 5000000L

  def cap(spark: SparkSession): Long =
    spark.conf.get(CapKey, DefaultCap.toString).toLong

  /** Gate a pair generator over `corpus`. `estimate(p)` must return the
    * generator's estimated FULL-CORPUS output count, usually by running
    * its exact semantics on the deterministic fraction-`p` id sample and
    * scaling by 1/p² (an exact upper bound may ignore `p`). Returns the
    * corpus row count so callers can reuse it (grid/band geometry).
    * Throws IllegalArgumentException mentioning [[CapKey]] past the cap.
    */
  def check(corpus: DataFrame, who: String, remedy: String)
           (estimate: Double => Long): Long = {
    val spark = corpus.sparkSession
    val mx = cap(spark)
    val n = corpus.count()
    if (mx <= 0L || n <= 1L) return n
    if (n.toDouble * (n - 1).toDouble / 2.0 <= mx.toDouble) return n
    val target = spark.conf.get(RowsKey, "2048").toDouble
    require(target >= 2, s"$RowsKey must be >= 2 (got $target)")
    val p = math.min(1.0, target / n.toDouble)
    val est = estimate(p)
    require(est <= mx,
      s"$who estimates ~$est output pairs over $n rows (deterministic " +
        f"${p * 100}%.2f%% sample) — past $CapKey=$mx. $remedy; or raise " +
        s"$CapKey if the downstream truly consumes a pair table this size " +
        s"(0 disables the gate)")
    n
  }
}
