package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned quality classification — the fastText-style linear classifier
  * of the FineWeb-Edu / DCLM curation recipe: distill a label source
  * (LLM judgments, heuristic gates, curated seed sets) into a cheap model
  * and score the whole corpus with it. Features are hashed bag-of-words
  * (token → bucket via xxhash64 mod `dim` — no vocabulary to build or
  * ship); training is full-batch gradient descent where EACH ITERATION IS
  * ONE PAIR OF AGGREGATIONS over the feature table (margins per doc, then
  * gradient per bucket), so the only driver state is the weight vector
  * itself — model-sized, like the k-means centroids in [[Similarity]].
  *
  * Determinism: every distributed sum (margins, gradients) accumulates in
  * decimal after a round-to-12, so training is bit-identical under any
  * partitioning or cluster size — the property that makes a trained
  * filter auditable (re-run the job, get the same kept corpus).
  *
  * Scale: an iteration shuffles the feature stream twice (doc-keyed
  * margin sum, bucket-keyed gradient sum, both partial-aggregated; the
  * gradient collect is `dim + 1` rows). The caller should persist the
  * feature table across iterations at real scale — [[trainLogReg]] does
  * it when asked. Scoring is one broadcast join + one doc-keyed
  * aggregate: the same cost as one quality-score pass.
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

  /** Per-doc margin w·x + intercept for the current weights — one
    * broadcast join + one doc-keyed decimal sum. Returns (id, margin).
    */
  private def margins(feats: DataFrame, w: Array[Double], idCol: String): DataFrame =
    feats
      .join(weightsDf(feats, w.dropRight(1)), "bucket")
      .groupBy(col(idCol))
      .agg((decSum(col("x") * col("w")) + lit(w.last)).as("margin"))

  /** Full-batch logistic regression on `feats` (id, bucket, x) against
    * `labels` (id, y ∈ {0,1}). Returns the trained weight vector
    * (index = bucket; slot `dim` is the intercept). `persist` caches the
    * joined feature/label table across iterations (unpersisted on exit).
    */
  def trainLogReg(feats: DataFrame, labels: DataFrame, dim: Int,
                  iters: Int = 20, lr: Double = 4.0,
                  idCol: String = "doc_id", persist: Boolean = true): Array[Double] = {
    val joined0 = feats.join(labels, idCol)
    val joined = if (persist) joined0.persist() else joined0
    try {
      val n = labels.count().toDouble
      require(n > 0, "empty training set")
      val w = Array.fill(dim + 1)(0.0)
      for (_ <- 0 until iters) {
        // residual r = sigmoid(margin) - y per doc, joined back to the
        // features by id; gradient per bucket = Σ r·x (decimal-exact)
        val res = margins(joined, w, idCol)
          .withColumn("__r", lit(1.0) / (lit(1.0) + exp(-col("margin"))) - lit(0.0))
        val resWithY = res.join(labels, idCol)
          .select(col(idCol), (col("__r") - col("y")).as("r"))
        val grad = joined
          .join(resWithY, idCol)
          .groupBy(col("bucket"))
          .agg(decSum(col("r") * col("x")).as("g"))
          .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
        val gInt = resWithY.agg(decSum(col("r")).as("g")).head().getDouble(0)
        for (b <- 0 until dim) w(b) -= lr * grad.getOrElse(b, 0.0) / n
        w(dim) -= lr * gInt / n
      }
      w
    } finally if (persist) { joined.unpersist(); () }
  }

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
                idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val quality = TextAnalysis.qualityScore(docs, textCol, idCol)
      .select(col(idCol), col("quality"))
    val med = quality.agg(expr("percentile(quality, 0.5)")).head().getDouble(0)
    val labels = quality.select(col(idCol),
      when(col("quality") >= lit(med), 1.0).otherwise(0.0).as("y"))
    val isTest = pmod(xxhash64(col(idCol)), lit(5L)) === 0
    val feats = hashedFeatures(docs, dim, textCol, idCol)
    val w = trainLogReg(feats.where(!isTest), labels.where(!isTest), dim,
      iters = iters, lr = lr, idCol = idCol)
    val scored = scoreLogReg(feats.where(isTest), w, idCol)
      .join(labels, idCol)
      .select(col("y"), when(col("prob") >= 0.5, 1.0).otherwise(0.0).as("yh"))
    import spark.implicits._
    val nTrain = labels.where(!isTest).count()
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
  }
}
