package graft

import graft.operators.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** End-to-end curation pipeline: the operators composing the way a real
  * training-data build would chain them — scrub → quality gate → exact
  * dedup → near-dedup → split → mixture. One integration path proving the
  * stages compose on their actual output schemas, stay deterministic, and
  * only ever shrink the corpus.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("scrub -> quality -> exact dedup -> near dedup -> split -> mix composes") {
    val docs = Tables.documents(spark, sfDir)
    val n0 = docs.count()

    // 1. redact PII in place
    val scrubbed = docs.withColumn("text", TextAnalysis.scrubPii(col("text")))
    assert(scrubbed.count() === n0)

    // 2. quality gate: keep docs above a floor
    val quality = TextAnalysis.qualityScore(scrubbed)
      .where(col("quality") > 0.3).select("doc_id")
    val gated = scrubbed.join(quality, "doc_id")
    val n2 = gated.count()
    assert(n2 > 0 && n2 <= n0)

    // 3. exact dedup, then near-dedup on the survivors
    val exact = Dedup.deduplicate(gated)
    val n3 = exact.count()
    assert(n3 > 0 && n3 <= n2)
    val near = Dedup.deduplicateNear(exact, 0.4)
    val n4 = near.count()
    assert(n4 > 0 && n4 <= n3)

    // 4. deterministic split + per-language mixture
    val split = Sampling.assignSplit(near, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.1))
    assert(split.count() === n4)
    val train = split.where(col("split") === "train")
    val mixed = Sampling.mixCorpora(train, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 1.0, "fr" -> 1.0, "es" -> 1.0))
    val n5 = mixed.count()
    assert(n5 > 0 && n5 < n4)

    // the whole chain is reproducible end to end
    val again = Sampling.mixCorpora(
      Sampling.assignSplit(
        Dedup.deduplicateNear(
          Dedup.deduplicate(
            scrubbed.join(quality, "doc_id")), 0.4),
        "doc_id", Seq("train" -> 0.9, "val" -> 0.1))
        .where(col("split") === "train"),
      "lang", "doc_id", Map("en" -> 0.5, "de" -> 1.0, "fr" -> 1.0, "es" -> 1.0))
    assert(again.select("doc_id").as[Long].collect().sorted.toSeq ===
      mixed.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("q_pipeline_e2e: gate, dedup and decontamination invariants all hold on the output") {
    val out = SparkEntry.queries("q_pipeline_e2e")(spark, sfDir)
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // every survivor is a non-benchmark doc at or above the gated corpus'
    // 25th quality percentile (threshold recomputed brute-force)
    val corpusQ = TextAnalysis.qualityScore(
      docs.filter(_._1 % 50 != 0).toSeq.toDF("doc_id", "text"))
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    val sorted = corpusQ.values.toArray.sorted
    val rank = 0.25 * (sorted.length - 1)
    val thr = sorted(rank.toInt) +
      (rank - rank.toInt) * (sorted(math.min(rank.toInt + 1, sorted.length - 1)) - sorted(rank.toInt))
    assert(out.keys.forall(id => id % 50 != 0 && corpusQ(id) >= thr - 1e-9))
    // no two survivors share a text, and each survivor is the SMALLEST
    // gated id for its text (keep-first)
    val gatedIds = corpusQ.filter { case (_, q) => q >= thr - 1e-9 }.keySet
    val byText = gatedIds.groupBy(docs(_))
    assert(out.keySet.forall(id => byText(docs(id)).min == id))
    // no survivor shares a word 8-gram with the benchmark slice
    def grams(t: String): Set[String] = {
      val toks = t.trim.toLowerCase.split("\\s+").toSeq
      (if (toks.length <= 8) Seq(toks.mkString(" "))
       else toks.sliding(8).map(_.mkString(" ")).toSeq).toSet
    }
    val benchGrams = docs.filter(_._1 % 50 == 0).values.flatMap(grams).toSet
    assert(out.keys.forall(id => grams(docs(id)).intersect(benchGrams).isEmpty))
  }
}
