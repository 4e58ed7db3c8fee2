package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned quality classification — the fastText-style linear classifier
  * of the FineWeb-Edu / DCLM curation recipe: distill a label source
  * (LLM judgments, heuristic gates, curated seed sets) into a cheap model
  * and score the whole corpus with it. Features are hashed bag-of-words
  * (token → bucket via xxhash64 mod `dim` — no vocabulary to build or
  * ship); training is full-batch gradient descent over a BOUNDED,
  * deterministically hash-sampled training set, where each iteration is
  * ONE job over a cached per-doc feature-array table (margin fold inline,
  * gradient per bucket), so the only driver state is the weight vector
  * itself — model-sized, like the k-means centroids in [[Similarity]].
  *
  * Determinism: per-doc feature arrays are sort-canonicalized (fixed fold
  * order) and the gradient accumulates in decimal after a round-to-12, so
  * training is bit-identical under any partitioning or cluster size — the
  * property that makes a trained filter auditable (re-run the job, get
  * the same kept corpus).
  *
  * Scale: training cost is O(iters × capped-label-set) regardless of
  * corpus size — see [[trainLogReg]]. Scoring is one broadcast join + one
  * doc-keyed aggregate: the same cost as one quality-score pass, and the
  * ONLY corpus-scale stage in the recipe.
  */
object Classifier {

  /** Hashed bag-of-words features: (id, bucket, x) with x = token count /
    * doc length (bounded (0, 1], so no per-feature scaling pass).
    */
  def hashedFeatures(docs: DataFrame, dim: Int = 256,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol), explode(Dedup.tokens(textCol)).as("__tok"))
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("__dl"))
    toks
      .groupBy(col(idCol), pmod(xxhash64(col("__tok")), lit(dim.toLong)).as("bucket"))
      .agg(count(lit(1)).as("__cnt"))
      .join(dl, idCol)
      .select(col(idCol), col("bucket"),
        (col("__cnt").cast("double") / col("__dl")).as("x"))
  }

  /** Order-independent double sum: round to 12 decimals, accumulate in
    * decimal (exact, associative), convert once.
    */
  private def decSum(c: Column): Column =
    sum(round(c, 12).cast("decimal(28,12)")).cast("double")

  private def weightsDf(feats: DataFrame, w: Array[Double]): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    broadcast(w.indices.map(b => (b.toLong, w(b))).toDF("bucket", "w"))
  }

  /** Full-batch logistic regression on `feats` (id, bucket, x) against
    * `labels` (id, y ∈ {0,1}). Returns the trained weight vector
    * (index = bucket; slot `dim` is the intercept).
    *
    * Cost shape, by design:
    *   - training is bounded: if more than `maxTrain` labeled docs
    *     arrive, the `maxTrain` smallest by deterministic id-hash are
    *     kept — an EXACT top-k cap, see [[cappedLabels]] (the
    *     distillation recipes this models train on 10⁵–10⁶ labels, never
    *     the corpus — at 100 TB the corpus pass belongs to SCORING only);
    *   - setup is ONE shuffle: features join labels, the intercept enters
    *     as a pseudo-feature (bucket = dim, x = 1), and each doc collapses
    *     to a sorted (bucket, x) array, cached when `persist`;
    *   - each iteration is then ONE single-stage treeAggregate over the
    *     cache (the MLlib GD shape — weights broadcast, dim+1 partial
    *     gradient arrays combined driver-ward): no join, no exchange, no
    *     per-iteration query planning.
    *
    * Determinism: the per-doc arrays are array_sort-canonicalized so the
    * margin fold order is fixed, and the gradient accumulates as
    * fixed-point longs (round-to-12 × 10¹²) — exact commutative addition,
    * so training is bit-identical under any input partitioning.
    */
  def trainLogReg(feats: DataFrame, labels: DataFrame, dim: Int,
                  iters: Int = 20, lr: Double = 4.0,
                  idCol: String = "doc_id", persist: Boolean = true,
                  maxTrain: Int = 50000): Array[Double] = {
    val nAll = labels.count()
    require(nAll > 0, "empty training set")
    val labelsS = cappedLabels(labels, nAll, maxTrain, idCol)
    val spark = feats.sparkSession
    import spark.implicits._
    // size the cached train table's partition count from the CAPPED label
    // count, not the session shuffle default: each GD iteration launches
    // one task per partition, so a ≤ 50k-row table spread over 32 shuffle
    // partitions pays iters × 32 task launches to scan a few thousand
    // rows each (measured: the scheduling overhead, not the fold, is the
    // iteration cost at bench scale). ~16k docs per task keeps tasks
    // milliseconds-cheap; the cap bounds this at 4 partitions no matter
    // the corpus, and training stays bit-identical under any partitioning
    // (fixed-point commutative gradient — ClassifierSpec pins it).
    val nTrain = math.min(nAll, maxTrain.toLong)
    val parts = math.max(1, math.min(((nTrain + 16383) / 16384).toInt,
      spark.sparkContext.defaultParallelism))
    val docFeats = docFeatureArrays(feats, labelsS, dim, idCol)
      .select(col("y"), expr("transform(f, s -> struct(s.bucket AS _1, s.x AS _2))").as("f"))
      .as[(Double, Array[(Long, Double)])]
      .repartition(parts)
    val cached = if (persist) docFeats.persist() else docFeats
    try {
      val n = cached.count().toDouble
      val w = Array.fill(dim + 1)(0.0)
      // Each iteration is ONE single-stage treeAggregate over the cached
      // table (the MLlib GD shape): margin folded over the sorted per-doc
      // array, residual·x accumulated per bucket as FIXED-POINT longs
      // (×10¹² after a round-to-12) — exact, commutative addition, so the
      // gradient is bit-identical under any partitioning, like decSum but
      // without a shuffle, a broadcast join, or per-iteration planning.
      // Overflow headroom: |r·x| ≤ 1 ⇒ ≤ 10¹² per term; the cap bounds
      // terms per bucket ≪ 9.2 × 10¹⁸ / 10¹².
      val rdd = cached.rdd
      for (_ <- 0 until iters) {
        val wb = spark.sparkContext.broadcast(w.clone())
        val gradFixed = rdd.treeAggregate(new Array[Long](dim + 1))(
          seqOp = { (acc, row) =>
            val (y, f) = row
            val wv = wb.value
            var m = 0.0
            var i = 0
            while (i < f.length) { m += wv(f(i)._1.toInt) * f(i)._2; i += 1 }
            val r = 1.0 / (1.0 + math.exp(-m)) - y
            i = 0
            while (i < f.length) {
              acc(f(i)._1.toInt) += math.rint(r * f(i)._2 * 1e12).toLong
              i += 1
            }
            acc
          },
          combOp = { (a, b) => var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
        wb.destroy()
        for (b <- 0 to dim) w(b) -= lr * (gradFixed(b) / 1e12) / n
      }
      w
    } finally if (persist) { cached.unpersist(); () }
  }

  /** The training-set cap as an EXACT bound: the `maxTrain` docs with the
    * smallest deterministic id-hash (id itself breaks hash ties), via
    * top-k — Spark plans orderBy+limit as TakeOrderedAndProject (bounded
    * heaps per partition, k rows to the driver-side stage, no full sort).
    * A plain hash-threshold filter only caps in EXPECTATION (binomial
    * around the target); this keeps both the promise in the name and
    * determinism under any partitioning.
    */
  private[graft] def cappedLabels(labels: DataFrame, nAll: Long, maxTrain: Int,
                                  idCol: String): DataFrame =
    if (nAll <= maxTrain) labels
    else labels.orderBy(xxhash64(col(idCol), lit("train_cap")), col(idCol)).limit(maxTrain)

  /** Per-doc sort-canonicalized (bucket, x) arrays with the intercept as
    * pseudo-bucket `dim` — the one shuffle of training setup.
    */
  private[graft] def docFeatureArrays(feats: DataFrame, labels: DataFrame, dim: Int,
                                      idCol: String = "doc_id"): DataFrame =
    feats.join(labels, idCol)
      .select(col(idCol), col("y"), col("bucket").cast("long").as("bucket"), col("x"))
      .union(labels.select(col(idCol), col("y"), lit(dim.toLong), lit(1.0)))
      .groupBy(col(idCol), col("y"))
      .agg(array_sort(collect_list(struct(col("bucket"), col("x")))).as("f"))

  /** Score documents under a trained weight vector: (id, prob) with prob
    * rounded to 6 decimals — one broadcast join + one doc-keyed sum.
    * Docs with NO feature hitting a nonzero weight still score (they
    * carry the intercept alone) via the left join + coalesce.
    */
  def scoreLogReg(feats: DataFrame, w: Array[Double],
                  idCol: String = "doc_id"): DataFrame = {
    val wx = feats
      .join(weightsDf(feats, w.dropRight(1)), "bucket")
      .groupBy(col(idCol))
      .agg(decSum(col("x") * col("w")).as("__wx"))
    val ids = feats.select(col(idCol)).distinct()
    ids.join(wx, Seq(idCol), "left")
      .select(col(idCol),
        round(lit(1.0) / (lit(1.0) + exp(-(coalesce(col("__wx"), lit(0.0)) + lit(w.last)))), 6)
          .as("prob"))
  }

  /** Classifier quality AS DATA — the family's q_ann_recall analogue. The
    * full distillation loop on one corpus: labels come from the heuristic
    * quality gate (top half by [[TextAnalysis.qualityScore]] against the
    * exact median — the cheap stand-in for the LLM judgments a FineWeb-Edu
    * recipe distills), an id-hash 80/20 split separates train from
    * held-out, the linear model trains on the train side only, and the
    * held-out confusion at prob ≥ 0.5 is emitted as one metrics row:
    * (n_train, n_test, base_rate, accuracy, precision, recall).
    *
    * Everything is deterministic (decimal sums, exact percentile, hash
    * split), so the row is reproducible across runs and cluster sizes;
    * training is iterative (not SQL-expressible) → rows check, with the
    * separable-corpus accuracy floor and partitioning invariance asserted
    * in ClassifierSpec.
    */
  def scorecard(docs: DataFrame, dim: Int = 256, iters: Int = 15,
                lr: Double = 4.0, textCol: String = "text",
                idCol: String = "doc_id", maxTrain: Int = 50000): DataFrame = {
    val spark = docs.sparkSession
    // labels (id, y) and hashed features are each consumed by several
    // actions (median, train join, train count, held-out scoring) —
    // persist both so the regex quality pass and the tokenize/hash pass
    // run ONCE over the corpus, not once per consumer.
    val quality = TextAnalysis.qualityScore(docs, textCol, idCol)
      .select(col(idCol), col("quality")).persist()
    val feats = hashedFeatures(docs, dim, textCol, idCol).persist()
    try {
    val med = quality.agg(expr("percentile(quality, 0.5)")).head().getDouble(0)
    val labels = quality.select(col(idCol),
      when(col("quality") >= lit(med), 1.0).otherwise(0.0).as("y"))
    val isTest = pmod(xxhash64(col(idCol)), lit(5L)) === 0
    val w = trainLogReg(feats.where(!isTest), labels.where(!isTest), dim,
      iters = iters, lr = lr, idCol = idCol, maxTrain = maxTrain)
    val scored = scoreLogReg(feats.where(isTest), w, idCol)
      .join(labels, idCol)
      .select(col("y"), when(col("prob") >= 0.5, 1.0).otherwise(0.0).as("yh"))
    import spark.implicits._
    // n_train reports the docs the model ACTUALLY trained on — when the
    // cap binds, the split size would overstate it
    val nTrain = math.min(labels.where(!isTest).count(), maxTrain.toLong)
    val agg = scored.agg(
      count(lit(1)).as("n"), sum(col("y")).as("pos"),
      sum(when(col("y") === col("yh"), 1L).otherwise(0L)).as("correct"),
      sum(when(col("yh") === 1.0, 1L).otherwise(0L)).as("predPos"),
      sum(when(col("y") === 1.0 && col("yh") === 1.0, 1L).otherwise(0L)).as("tp"))
      .head()
    val (n, pos, correct, predPos, tp) = (agg.getLong(0),
      agg.getDouble(1), agg.getLong(2), agg.getLong(3), agg.getLong(4))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    Seq((nTrain, n, r6(pos / n), r6(correct.toDouble / n),
      r6(if (predPos == 0) 0.0 else tp.toDouble / predPos),
      r6(if (pos == 0) 0.0 else tp / pos)))
      .toDF("n_train", "n_test", "base_rate", "accuracy", "precision", "recall")
    } finally { quality.unpersist(); feats.unpersist(); () }
  }
}
