package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-6 curation operators: BM25 retrieval, per-domain quota capping,
  * span-level (substring) dedup, hash-order shard assignment, and the
  * bucketed interval join.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- BM25 ----

  test("bm25TopK matches the hand-computed formula on a tiny corpus") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "banana banana banana banana")).toDF("doc_id", "text")
    val qs = Seq((1L, "apple banana")).toDF("q_id", "q_text")
    val out = Retrieval.bm25TopK(docs, qs, k = 10)
      .orderBy($"score".desc).as[(Long, Long, Double)].collect()
    // N=3, avgdl=3, df(apple)=df(banana)=2 → idf=ln(1.6) for both terms
    val idf = math.log(1.6)
    def tfn(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / 3.0))
    val exp = Map(
      1L -> (idf * tfn(2, 3) + idf * tfn(1, 3)),
      2L -> idf * tfn(1, 2),
      3L -> idf * tfn(4, 4))
    assert(out.map(_._2).toSeq === Seq(1L, 3L, 2L)) // both-terms doc first
    out.foreach { case (_, d, s) => assert(math.abs(s - exp(d)) < 1e-5, s"doc $d") }
  }

  test("bm25TopK bounds k per query and ignores out-of-vocabulary terms") {
    val docs = (1L to 30L).map(i => (i, s"common token w$i")).toDF("doc_id", "text")
    val qs = Seq((1L, "common zzz_never_seen"), (2L, "zzz_never_seen")).toDF("q_id", "q_text")
    val out = Retrieval.bm25TopK(docs, qs, k = 5).as[(Long, Long, Double)].collect()
    // q2's only term is OOV → no rows; q1 scores on "common" alone, capped at 5
    assert(out.forall(_._1 == 1L) && out.length === 5)
  }

  // ---- reciprocal-rank fusion ----

  test("rrfFuse sums 1/(c+rank) over the lists that ranked each doc") {
    val lex = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
      .toDF("q_id", "doc_id", "rank")
    val dense = Seq((1L, 20L, 1), (1L, 40L, 2))
      .toDF("q_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(lex, dense), k = 10, c = 60)
      .as[(Long, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    def t(r: Int) = BigDecimal(1.0 / (60 + r)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def exp(rs: Int*) = rs.map(t).sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(20L) === exp(2, 1)) // in both lists: ranks 2 (lex) + 1 (dense)
    assert(out(10L) === exp(1))
    assert(out(30L) === exp(3))
    assert(out(40L) === exp(2))
    // doc 20 fused to the top: present in both lists beats either single hit
    assert(out.maxBy(_._2)._1 === 20L)
  }

  test("rrfFuse cuts to k per query and keeps queries independent") {
    val a = (1 to 8).map(r => (1L, r.toLong, r)) ++ (1 to 3).map(r => (2L, 100L + r, r))
    val out = Retrieval.rrfFuse(Seq(a.toDF("q_id", "doc_id", "rank")), k = 5)
      .as[(Long, Long, Double)].collect()
    assert(out.count(_._1 == 1L) === 5 && out.count(_._1 == 2L) === 3)
    // rank order preserved: lower original rank → higher rrf score
    val q1 = out.filter(_._1 == 1L).sortBy(-_._3).map(_._2).toSeq
    assert(q1 === Seq(1L, 2L, 3L, 4L, 5L))
  }

  // ---- ranking evaluation ----

  test("rankEval reproduces hand-computed nDCG/MRR/P@k") {
    // ranking for q1: docs at ranks 1..3 with grades 0, 2, 1
    val rk = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
      .toDF("q_id", "doc_id", "rank")
    // corpus relevance: doc20 grade 2, doc30 grade 1, doc99 grade 3 (missed)
    val rel = Seq((1L, 20L, 2), (1L, 30L, 1), (1L, 99L, 3))
      .toDF("q_id", "doc_id", "rel")
    val Array((q, ndcg, mrr, p)) =
      Retrieval.rankEval(rk, rel, k = 3).as[(Long, Double, Double, Double)].collect()
    def term(rel: Int, rank: Int) =
      BigDecimal((math.pow(2, rel) - 1) / (math.log(rank + 1) / math.log(2)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val dcg = (term(0, 1) + term(2, 2) + term(1, 3)).toDouble
    // ideal ordering of q1's OWN grades: 3, 2, 1
    val idcg = (term(3, 1) + term(2, 2) + term(1, 3)).toDouble
    assert(q === 1L)
    assert(ndcg === BigDecimal(dcg / idcg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(mrr === 0.5)         // first relevant at rank 2
    assert(p === 2.0 / 3.0)     // 2 of 3 ranked docs relevant
  }

  test("rankEval scores zero for a query with no relevant docs and cuts the ideal list at k") {
    val rk = Seq((1L, 10L, 1), (2L, 10L, 1), (2L, 20L, 2))
      .toDF("q_id", "doc_id", "rank")
    // q1 has NO relevance anywhere; q2 has 4 graded docs but k=2
    val rel = (1 to 4).map(i => (2L, i * 10L, i)).toDF("q_id", "doc_id", "rel")
    val out = Retrieval.rankEval(rk, rel, k = 2)
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 0.0, 0.0, 0.0)))
    // q2: ranked docs 10 (rel 1) and 20 (rel 2); ideal@2 = grades 4, 3
    def term(rel: Int, rank: Int) =
      BigDecimal((math.pow(2, rel) - 1) / (math.log(rank + 1) / math.log(2)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val dcg = (term(1, 1) + term(2, 2)).toDouble
    val idcg = (term(4, 1) + term(3, 2)).toDouble
    assert(out(2L)._2 ===
      BigDecimal(dcg / idcg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(2L)._3 === 1.0 && out(2L)._4 === 1.0)
  }

  // ---- domain cap ----

  test("domainCap keeps the cap best-quality docs per host, whole hosts under it") {
    // host A: 8 docs with quality increasing in doc length; host B: 2 docs
    val docs = ((1L to 8L).map(i =>
      (i, Seq.fill(i.toInt * 5)("the good words flow here").mkString(" "),
        s"https://a.example.com/$i")) ++
      Seq((20L, "short b one", "https://b.example.com/1"),
        (21L, "short b two", "https://b.example.com/2")))
      .toDF("doc_id", "text", "url")
    val kept = TextAnalysis.domainCap(docs, cap = 3)
      .select("host", "doc_id").as[(String, Long)].collect()
    // reference: plain window rank on the same quality scores
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"host").orderBy($"quality".desc, $"doc_id".asc)
    val ref = TextAnalysis.qualityScore(docs, keep = Seq("url"))
      .select($"doc_id", TextAnalysis.urlHost($"url").as("host"), $"quality")
      .withColumn("rn", row_number().over(w)).where($"rn" <= 3)
      .select("host", "doc_id").as[(String, Long)].collect()
    assert(kept.toSet === ref.toSet)
    assert(kept.count(_._1 == "a.example.com") === 3)
    assert(kept.filter(_._1 == "b.example.com").map(_._2).toSet === Set(20L, 21L))
  }

  // ---- span dedup ----

  test("spanDedup strips exactly the repeated run from later docs, first kept") {
    val run = (1 to 10).map(i => s"r$i").mkString(" ") // 10-token repeated run
    val docs = Seq(
      (1L, s"a1 a2 a3 $run a4 a5"),
      (2L, s"b1 b2 $run b3 b4 b5 b6"), // copies the run → loses exactly it
      (3L, "c1 c2 c3 c4 c5")).toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, k = 8)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0)._4 === s"a1 a2 a3 $run a4 a5") // first occurrence intact
    assert(out(1)._4 === "b1 b2 b3 b4 b5 b6")    // run removed, order intact
    assert(out(1)._2 === 16L && out(1)._3 === 6L)
    assert(out(2)._4 === "c1 c2 c3 c4 c5")       // untouched (and < k tokens)
  }

  test("spanDedup merges overlapping spans and removes in-doc repeats") {
    val run = (1 to 12).map(i => s"t$i").mkString(" ")
    // the run appears twice INSIDE one doc → second occurrence removed
    val docs = Seq((1L, s"$run x1 x2 $run"),
      (2L, "u1 u2 u3 u4 u5 u6 u7")).toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, k = 8)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0)._4 === s"$run x1 x2")
    assert(out(0)._3 === 14L)
    // a doc that is ONE whole repeated span empties rather than vanishing
    val tpl = (1 to 9).map(i => s"z$i").mkString(" ")
    val emptied = SpanDedup.dedupSpans(
      Seq((1L, tpl), (2L, tpl)).toDF("doc_id", "text"), k = 8)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(emptied(0)._4 === tpl && emptied(1)._4 === "" && emptied(1)._3 === 0L)
  }

  test("spanDedup is invariant to input partitioning") {
    val docs = Tables.documents(spark, sfDir)
    val a = SpanDedup.dedupSpans(docs, k = 8)
      .as[(Long, Long, Long, String)].collect().toSet
    val b = SpanDedup.dedupSpans(docs.repartition(7, $"text"), k = 8)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(a === b && a.nonEmpty)
  }

  // ---- shard assignment ----

  test("shardAssign tiles the token stream deterministically in hash order") {
    val docs = Tables.documents(spark, sfDir)
    val out = Packing.shardAssign(docs, budget = 512)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length === docs.count())
    out.foreach(r => assert(r._4 >= 0 && r._4 < 512)) // offset ∈ [0, budget)
    // contiguous tiling: total tokens == last doc's start + its length
    val total = out.map(_._2).sum
    val maxStart = out.map(r => r._3 * 512 + r._4).max
    assert(maxStart + out.find(r => r._3 * 512 + r._4 == maxStart).get._2 === total)
    // same assignment whatever the input partitioning (run-to-run stability)
    val again = Packing.shardAssign(docs.repartition(11), budget = 512)
      .as[(Long, Long, Long, Long)].collect()
    assert(again.toSet === out.toSet)
    // hash order ≠ id order: packSequences over doc_id disagrees somewhere
    val byId = Packing.packSequences(docs, budget = 512)
      .as[(Long, Long, Long, Long)].collect()
    assert(byId.toSet !== out.toSet)
  }

  // ---- interval join ----

  test("pointInInterval equals the brute-force range join, multi-bucket safe") {
    val intervals = Seq(
      (1L, 10L, 0.0, 7000.0),     // spans 2 hour-buckets
      (1L, 11L, 7200.0, 7300.0),
      (1L, 12L, 6900.0, 7250.0),  // overlaps interval 11 → double matches
      (2L, 20L, 0.0, 100.0)
    ).toDF("user_id", "iv_id", "start_sec", "end_sec")
    val points = Seq(
      (1L, 100L, 3600.0), (1L, 101L, 7249.5), (1L, 102L, 9999.0),
      (2L, 200L, 100.0), (2L, 201L, 101.0), (3L, 300L, 50.0)
    ).toDF("user_id", "pt_id", "ts_sec")
    val got = IntervalJoin.pointInInterval(points, intervals,
        Seq("user_id"), "ts_sec", "start_sec", "end_sec", bucketSec = 3600L)
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    val brute = points.as("p").join(intervals.as("i"),
        $"p.user_id" === $"i.user_id" &&
          $"ts_sec" >= $"start_sec" && $"ts_sec" <= $"end_sec")
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got === brute)
    assert(got === Set((100L, 10L), (101L, 11L), (101L, 12L), (200L, 20L)))
  }

  test("pointInInterval plans an equi-join, not a nested loop") {
    val q = SparkEntry.queries("q_interval_join")(spark, sfDir)
    val p = q.queryExecution.executedPlan.toString()
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }
}
