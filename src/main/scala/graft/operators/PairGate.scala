package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{lit, pmod, xxhash64}

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

  /** Sample-fraction granularity: keep-thresholds quantize to 1/2³⁰, so
    * the smallest non-empty sample fraction is ~9.3e-10 — a ~2048-row
    * target stays non-degenerate to corpora of ~2×10¹² rows (and the
    * k ≥ 1 floor keeps it non-empty beyond that). Sampling
    * .samplePredicate's 4-hex-digit md5 threshold quantizes at 1/65536:
    * past ~1.3×10⁸ rows the requested fraction rounds to ZERO kept rows
    * and a gate built on it would estimate 0 and pass — in exactly the
    * regime the gate exists for.
    */
  private val SampleScale = 1L << 30

  private def sampleK(p: Double): Long =
    math.max(1L, math.round(p * SampleScale))

  /** The REALIZED sample fraction for a requested `p` — what 1/p²
    * scaling must divide by (check() hands this, not the raw request,
    * to the estimator).
    */
  def realizedFraction(p: Double): Double = sampleK(p).toDouble / SampleScale

  /** Deterministic fine-grained id-sample predicate for tier-2
    * estimators: keeps a row iff pmod(xxhash64(id), 2³⁰) < k with
    * k = max(1, round(p·2³⁰)) — hash-uniform, structure-independent,
    * and consistent with [[realizedFraction]] by construction.
    */
  def samplePredicate(id: Column, p: Double): Column =
    if (p >= 1.0) lit(true)
    else pmod(xxhash64(id), lit(SampleScale)) < lit(sampleK(p))

  /** Gate a pair generator over `corpus`. `estimate(p)` must return the
    * generator's estimated FULL-CORPUS output count, usually by running
    * its exact semantics on the [[samplePredicate]] fraction-`p` id
    * sample and scaling by 1/p² — `p` arrives already REALIZED (post
    * quantization), so the scaling is exact (an exact upper bound may
    * ignore `p`). Returns the corpus row count for callers that reuse
    * it (grid/band geometry), or -1 WITHOUT counting when the gate is
    * disabled (cap ≤ 0) — such callers count for themselves if they
    * need n. Throws IllegalArgumentException mentioning [[CapKey]] past
    * the cap.
    */
  def check(corpus: DataFrame, who: String, remedy: String)
           (estimate: Double => Long): Long = {
    val spark = corpus.sparkSession
    if (cap(spark) <= 0L) return -1L
    val n = corpus.count()
    checkCounted(spark, n, who, remedy)(estimate)
    n
  }

  /** [[check]] for callers that already hold the corpus row count (e.g.
    * because their geometry derivation needed it first).
    */
  def checkCounted(spark: SparkSession, n: Long, who: String, remedy: String)
                  (estimate: Double => Long): Unit = {
    val mx = cap(spark)
    if (mx <= 0L || n <= 1L) return
    if (n.toDouble * (n - 1).toDouble / 2.0 <= mx.toDouble) return
    val target = spark.conf.get(RowsKey, "2048").toDouble
    require(target >= 2, s"$RowsKey must be >= 2 (got $target)")
    val p = realizedFraction(math.min(1.0, target / n.toDouble))
    val est = estimate(p)
    require(est <= mx,
      s"$who estimates ~$est output pairs over $n rows (deterministic " +
        f"${p * 100}%.4f%% sample) — past $CapKey=$mx. $remedy; or raise " +
        s"$CapKey if the downstream truly consumes a pair table this size " +
        s"(0 disables the gate)")
  }
}
