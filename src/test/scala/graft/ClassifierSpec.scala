package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

/** Hashed-BOW logistic regression: hand-checked gradient steps, a
  * separable-corpus accuracy floor, determinism under partitioning, and
  * the q_classifier scorecard's invariants.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("trainLogReg takes the closed-form first gradient step") {
    // two docs, one feature each, opposite labels; from w = 0 every margin
    // is 0 → sigmoid 0.5 → residuals ±0.5 → after one lr=1.0 step:
    // w(bucket of the positive doc) = +0.25, negative's = −0.25, b = 0
    val feats = Seq((1L, 0L, 1.0), (2L, 1L, 1.0)).toDF("doc_id", "bucket", "x")
    val labels = Seq((1L, 1.0), (2L, 0.0)).toDF("doc_id", "y")
    val w = Classifier.trainLogReg(feats, labels, dim = 2, iters = 1, lr = 1.0)
    assert(math.abs(w(0) - 0.25) < 1e-12 && math.abs(w(1) + 0.25) < 1e-12)
    assert(math.abs(w(2)) < 1e-12)
  }

  test("intercept learns the base rate on featureless-signal data") {
    // every doc shares ONE identical feature → the weights can't separate;
    // 3/4 positive labels → trained model scores everyone the same prob,
    // and that prob must sit above 0.5 (majority class wins)
    val feats = (1L to 8L).map(i => (i, 0L, 1.0)).toDF("doc_id", "bucket", "x")
    val labels = (1L to 8L).map(i => (i, if (i <= 6) 1.0 else 0.0)).toDF("doc_id", "y")
    val w = Classifier.trainLogReg(feats, labels, dim = 1, iters = 30, lr = 2.0)
    val probs = Classifier.scoreLogReg(feats, w).select("prob").as[Double].collect()
    assert(probs.toSet.size === 1 && probs.head > 0.5)
  }

  test("separable corpus: held-out accuracy >= 0.95, deterministic under partitioning") {
    // positives speak one vocabulary, negatives another — linearly
    // separable in hashed-BOW space (dim 64 >> 6 distinct tokens)
    val docs = (1L to 120L).map { i =>
      val good = i % 2 == 0
      val filler = s"doc$i"
      val text =
        if (good) s"alpha beta gamma alpha $filler" else s"zulu yankee xray zulu $filler"
      (i, text, good)
    }.toDF("doc_id", "text", "good")
    val labels = docs.select($"doc_id", when($"good", 1.0).otherwise(0.0).as("y"))
    val train = docs.where($"doc_id" <= 100)
    val test = docs.where($"doc_id" > 100)
    val feats = Classifier.hashedFeatures(docs.drop("good"), dim = 64)
    val trainFeats = feats.join(train.select("doc_id"), Seq("doc_id"), "left_semi")
    val w = Classifier.trainLogReg(trainFeats, labels.join(
      train.select("doc_id"), Seq("doc_id"), "left_semi"), dim = 64)
    val scored = Classifier.scoreLogReg(
        feats.join(test.select("doc_id"), Seq("doc_id"), "left_semi"), w)
      .join(labels, "doc_id")
    val acc = scored.agg(avg(when(($"prob" >= 0.5) === ($"y" === 1.0), 1.0)
      .otherwise(0.0))).head().getDouble(0)
    assert(acc >= 0.95, s"held-out accuracy $acc")
    // bit-identical training under a different input partitioning (the
    // decimal-sum determinism contract)
    val w2 = Classifier.trainLogReg(trainFeats.repartition(7), labels.join(
      train.select("doc_id"), Seq("doc_id"), "left_semi"), dim = 64)
    assert(w.toSeq === w2.toSeq)
  }

  test("maxTrain caps the training set deterministically without killing accuracy") {
    // same separable corpus, but the trainer is only allowed ~half the
    // labels: the hash-cap must (a) actually bind, (b) stay deterministic,
    // (c) still learn the separation
    val docs = (1L to 200L).map { i =>
      val good = i % 2 == 0
      val text = if (good) s"alpha beta gamma alpha doc$i" else s"zulu yankee xray zulu doc$i"
      (i, text, good)
    }.toDF("doc_id", "text", "good")
    val labels = docs.select($"doc_id", when($"good", 1.0).otherwise(0.0).as("y"))
    val feats = Classifier.hashedFeatures(docs.drop("good"), dim = 64)
    val w1 = Classifier.trainLogReg(feats, labels, dim = 64, maxTrain = 100)
    val w2 = Classifier.trainLogReg(feats.repartition(5), labels, dim = 64, maxTrain = 100)
    assert(w1.toSeq === w2.toSeq)
    val acc = Classifier.scoreLogReg(feats, w1).join(labels, "doc_id")
      .agg(avg(when(($"prob" >= 0.5) === ($"y" === 1.0), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.95, s"capped-training accuracy $acc")
  }

  test("docFeatureArrays: one exchange, sorted per-doc arrays, intercept as pseudo-bucket") {
    val feats = Seq((1L, 2L, 0.5), (1L, 0L, 1.0), (2L, 1L, 1.0)).toDF("doc_id", "bucket", "x")
    val labels = Seq((1L, 1.0), (2L, 0.0)).toDF("doc_id", "y")
    val df = Classifier.docFeatureArrays(feats, labels, dim = 3)
    // the training-setup plan shuffles ONCE (the per-doc collect_list);
    // the label join is broadcast, never sort-merge
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("SortMergeJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 1, p)
    val rows = df.collect().map(r => r.getDouble(1) ->
      r.getSeq[org.apache.spark.sql.Row](2).map(s => (s.getLong(0), s.getDouble(1)))).toMap
    // arrays arrive bucket-sorted (the fixed margin-fold order) with the
    // intercept pseudo-feature (bucket = dim, x = 1) appended
    assert(rows(1.0) === Seq((0L, 1.0), (2L, 0.5), (3L, 1.0)))
    assert(rows(0.0) === Seq((1L, 1.0), (3L, 1.0)))
  }

  test("scoreLogReg keeps docs whose features all miss the weight table") {
    val feats = Seq((1L, 0L, 1.0), (2L, 3L, 1.0)).toDF("doc_id", "bucket", "x")
    // weights cover buckets 0..1 only; doc 2's bucket 3 is out of range →
    // it must still score, on the intercept alone
    val w = Array(2.0, 0.0, -1.0)
    val out = Classifier.scoreLogReg(feats, w).as[(Long, Double)].collect().toMap
    assert(out.keySet === Set(1L, 2L))
    assert(math.abs(out(2L) - 1.0 / (1.0 + math.exp(1.0))) < 1e-6)
  }

  test("q_classifier scorecard: one consistent metrics row, reproducible") {
    val run1 = SparkEntry.queries("q_classifier")(spark, sfDir)
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(run1.length === 1)
    val (nTrain, nTest, base, acc, prec, rec) = run1.head
    val total = Tables.documents(spark, sfDir).count()
    assert(nTrain + nTest === total)
    assert(nTest > 0 && nTrain > nTest) // ~80/20 hash split
    Seq(base, acc, prec, rec).foreach(m => assert(m >= 0.0 && m <= 1.0))
    // the distilled gate is learnable well above chance on this corpus
    assert(acc > math.max(base, 1 - base) - 0.25, s"accuracy $acc vs base $base")
    val run2 = SparkEntry.queries("q_classifier")(spark, sfDir).collect()
    assert(run2.toSeq === run1.map(org.apache.spark.sql.Row.fromTuple).toSeq)
  }
}
