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

  test("assignSplit: exhaustive, disjoint, ~declared fractions, version-stable") {
    val docs = Tables.documents(spark, sfDir)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = Sampling.assignSplit(docs, "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect()
    assert(labeled.length === docs.count()) // every row exactly one label
    val frac = labeled.groupBy(_._2).view.mapValues(_.length / labeled.length.toDouble)
    assert(math.abs(frac("train") - 0.8) < 0.08, frac.toMap.toString)
    assert(math.abs(frac("val") - 0.1) < 0.06)
    // stability across corpus versions: a doc keeps its split when half the
    // corpus disappears
    val half = Sampling.assignSplit(
      docs.where($"doc_id" % 2 === 0), "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = labeled.toMap
    half.foreach { case (id, s) => assert(full(id) === s) }
  }

  test("scrubPii replaces URL/email/phone/IP with typed tokens") {
    import graft.operators.TextAnalysis
    val out = Seq("mail a.b@c.io see https://x.io/p?q=1 call 555-123-4567 host 10.0.0.255 end")
      .toDF("t").select(TextAnalysis.scrubPii($"t")).head.getString(0)
    assert(out === "mail <EMAIL> see <URL> call <PHONE> host <IP> end")
  }

  test("mixCorpora applies per-stratum rates and drops unlisted strata") {
    val docs = Tables.documents(spark, sfDir)
    val mixed = Sampling.mixCorpora(docs, "lang", "doc_id",
      Map("de" -> 1.0, "en" -> 0.0))
    val langs = mixed.select("lang").distinct().as[String].collect().toSet
    assert(langs === Set("de")) // en sampled at 0, zh/es/fr unlisted
    assert(mixed.count() === docs.where($"lang" === "de").count())
  }

  test("assignSplit: trailing zero-fraction split gets nothing (hex-overflow edge)") {
    val docs = Tables.documents(spark, sfDir)
    val out = Sampling.assignSplit(docs, "doc_id", Seq("train" -> 1.0, "heldout" -> 0.0))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(out === Map("train" -> docs.count()))
  }

  test("stratifiedExact: exactly k per stratum (capped by size), stable across runs") {
    val docs = Tables.documents(spark, sfDir)
    val sizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val sampled = Sampling.stratifiedExact(docs, "lang", "doc_id", 10)
    val got = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (lang, n) =>
      assert(got(lang) === math.min(10L, n), s"$lang")
    }
    // deterministic: same members every run
    val a = sampled.select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratifiedExact(docs, "lang", "doc_id", 10)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
    // membership is hash-ordered, not id-ordered (no head-of-table bias)
    val ids = sampled.where($"lang" === "en").select("doc_id").as[Long].collect()
    val lowestIds = docs.where($"lang" === "en").orderBy($"doc_id").limit(10)
      .select("doc_id").as[Long].collect()
    assert(ids.toSet !== lowestIds.toSet)
  }

  test("temperatureMix: smallest stratum keeps all, larger downsample toward n^alpha") {
    val df = (1L to 125L).map(i => (i, if (i <= 100) "big" else "small"))
      .toDF("id", "stratum")
    // alpha = 1: natural proportions — nothing dropped
    assert(Sampling.temperatureMix(df, "stratum", "id", 1.0).count() === 125L)
    // alpha = 0: uniform target — "small" (25) keeps all, "big" keeps rate 25/100
    val flat = Sampling.temperatureMix(df, "stratum", "id", 0.0)
    val byStratum = flat.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(byStratum("small") === 25L)
    assert(byStratum("big") > 10L && byStratum("big") < 45L, s"got ${byStratum("big")}")
    // deterministic membership
    val again = Sampling.temperatureMix(df, "stratum", "id", 0.0)
      .select("id").as[Long].collect().sorted.toSeq
    assert(flat.select("id").as[Long].collect().sorted.toSeq === again)
  }

  test("weightedSample: matches the local A-ES computation, stable, weight-sensitive") {
    val df = (1L to 400L).map(i => (i, if (i <= 40) 1000.0 else 1.0))
      .toDF("id", "w")
    val out = Sampling.weightedSample(df, "id", "w", k = 50)
      .select("id", "sample_key").as[(Long, Double)].collect()
    // local replay of the exact key formula (md5-derived u, pow, round-9)
    def key(id: Long, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(12)
      val u = java.lang.Long.parseLong(hex, 16).toDouble / math.pow(16.0, 12)
      BigDecimal(math.pow(u, 1.0 / w))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = (1L to 400L).map(i => (i, key(i, if (i <= 40) 1000.0 else 1.0)))
      .sortBy { case (id, k) => (-k, id) }.take(50)
    assert(out.sortBy { case (id, k) => (-k, id) }.toSeq === expect)
    // weight dominance: the 40 heavy rows (10% of rows, weight x1000) own
    // most of the sample
    assert(out.count(_._1 <= 40L) > 30, s"heavy rows in sample: ${out.count(_._1 <= 40L)}")
  }
}
