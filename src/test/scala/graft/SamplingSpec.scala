package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("deterministic sample: stable membership, ~requested fraction, consistent") {
    val docs = Tables.documents(spark, sfDir)
    val s1 = Sampling.deterministicSample(docs, "doc_id", 0.25).select("doc_id")
      .as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(docs, "doc_id", 0.25).select("doc_id")
      .as[Long].collect().toSet
    assert(s1 === s2)
    val n = docs.count().toDouble
    assert(math.abs(s1.size / n - 0.25) < 0.08, s"fraction ${s1.size / n}")
    // consistency: a smaller sample is a subset of a larger one
    val small = Sampling.deterministicSample(docs, "doc_id", 0.1).select("doc_id")
      .as[Long].collect().toSet
    assert(small.subsetOf(s1))
  }

  test("mixCorpora applies per-stratum rates and drops unlisted strata") {
    val docs = Tables.documents(spark, sfDir)
    val mixed = Sampling.mixCorpora(docs, "lang", "doc_id",
      Map("de" -> 1.0, "en" -> 0.0))
    val langs = mixed.select("lang").distinct().as[String].collect().toSet
    assert(langs === Set("de")) // en sampled at 0, zh/es/fr unlisted
    assert(mixed.count() === docs.where($"lang" === "de").count())
  }
}
