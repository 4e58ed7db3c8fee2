package graft

import graft.operators.{Analytics, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Crafted-input semantics for the round's relational shapes (Q4/Q21
  * decorrelations) and the LLM-data additions (bitext margin mining,
  * n-gram novelty, dataset card).
  */
class ExtraOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("latePriorityOrders: strictly-greater-than-lag boundary, one count per order") {
    val orders = Seq(
      (1L, "1-URGENT", ts("2024-01-01 00:00:00")),
      (2L, "1-URGENT", ts("2024-01-01 00:00:00")),
      (3L, "5-LOW", ts("2024-01-01 00:00:00"))
    ).toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = Seq(
      (1L, ts("2024-03-01 00:00:00")), // +60d exactly — NOT late
      (1L, ts("2024-03-02 00:00:00")), // +61d — late
      (1L, ts("2024-03-03 00:00:00")), // second late line — still ONE order
      (2L, ts("2024-01-15 00:00:00")), // on time
      (3L, ts("2024-06-01 00:00:00"))  // late
    ).toDF("l_orderkey", "l_shipdate")
    val got = Analytics.latePriorityOrders(orders, li, lagDays = 60)
      .as[(String, Long)].collect().toMap
    assert(got === Map("1-URGENT" -> 1L, "5-LOW" -> 1L))
  }

  test("soleLastShippers: sole last shipper credited, ties and single-supplier orders don't count") {
    val supplier = Seq((10L, "Supplier#10"), (11L, "Supplier#11"), (12L, "Supplier#12"))
      .toDF("s_suppkey", "s_name")
    val li = Seq(
      // order 1: suppliers 10,11; 11 ships last ALONE -> 11 blamed
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (1L, 11L, ts("2024-01-05 00:00:00")),
      // order 2: suppliers 10,11 TIE on the last date -> nobody blamed
      (2L, 10L, ts("2024-02-01 00:00:00")),
      (2L, 11L, ts("2024-02-01 00:00:00")),
      // order 3: single supplier -> excluded by n_supp >= 2
      (3L, 12L, ts("2024-03-01 00:00:00")),
      // order 4: suppliers 11,12; 11 last again
      (4L, 12L, ts("2024-04-01 00:00:00")),
      (4L, 11L, ts("2024-04-09 00:00:00"))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val got = Analytics.soleLastShippers(supplier, li, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("Supplier#11", 2L)))
  }

  test("bitextMine: margin separates a towering match from a flat neighborhood") {
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    // corpus (odd ids): 1 aligned with query 0's direction; 3,5,7 spread
    val corpus = Seq(
      (1L, v(1, 0, 0, 0)),
      (3L, v(0, 1, 0, 0)),
      (5L, v(0, 0, 1, 0)),
      (7L, v(0.5, 0.5, 0.5, 0.5))
    ).toDF("vec_id", "embedding")
    val queries = Seq(
      (0L, v(1, 0.05, 0, 0)),   // towers over runner-ups -> high margin
      (2L, v(0.5, 0.5, 0.5, 0.5)) // equidistant-ish neighborhood -> low margin
    ).toDF("vec_id", "embedding")
    val all = Similarity.bitextMine(corpus, queries, k = 4, minMargin = 0.0)
      .select($"qid", $"match_id", $"margin")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(all(0L)._2 === 1L)
    assert(all(2L)._2 === 7L) // exact duplicate of query 2's direction
    assert(all(0L)._3 > 1.5, s"expected towering margin, got ${all(0L)._3}")
    // query 2 has an exact duplicate (cos=1) but also three cos≈0.577
    // runner-ups: margin = 1 / mean(1,.577,.577,.577) ≈ 1.47 < query 0's
    assert(all(2L)._3 < all(0L)._3)
    // thresholding drops the weaker margin
    val kept = Similarity.bitextMine(corpus, queries, k = 4,
      minMargin = (all(2L)._3 + all(0L)._3) / 2)
      .select($"qid").as[Long].collect().toSeq
    assert(kept === Seq(0L))
  }

  test("ngramNovelty: shared grams score 0, unique docs score 1, short docs clamp to one gram") {
    val shared = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, shared),                          // all grams shared with doc 2
      (2L, shared),
      (3L, (1 to 12).map(i => s"x$i").mkString(" ")), // fully unique
      (4L, "tiny doc under eight tokens")    // one clamped gram, unique
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(docs, n = 8)
      .select($"doc_id", $"n_grams", $"novelty")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 === 5L) // 12 tokens -> 5 distinct 8-grams
    assert(got(1L)._3 === 0.0)
    assert(got(2L)._3 === 0.0)
    assert(got(3L)._3 === 1.0)
    assert(got(4L)._2 === 1L)
    assert(got(4L)._3 === 1.0)
  }

  test("datasetCard: per-(source,lang) volumes and exact-dup rate") {
    val docs = Seq(
      (1L, "a b c", "en", "s1", 5L),
      (2L, "a b c", "en", "s1", 5L), // exact dup of 1
      (3L, "d e", "en", "s1", 3L),
      (4L, "f", "fr", "s1", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.datasetCard(docs)
      .as[(String, String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq(
      ("s1", "en", 3L, 13L, 8L, 8.0 / 3, 1.0 - 2.0 / 3),
      ("s1", "fr", 1L, 1L, 1L, 1.0, 0.0)
    ).map { case (s, l, n, c, t, m, d) =>
      (s, l, n, c, t,
        BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    })
  }
}
