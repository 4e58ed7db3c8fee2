package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic Sennrich et al. worked example: est-family pairs dominate
  private val counts = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainMerges reproduces the hand-worked merge order on the classic corpus") {
    val merges = Bpe.trainMerges(counts, 3)
    // (e,s) appears in newest(6)+widest(3)=9 — the max; then es+t, then est+</w>
    assert(merges === Vector(("e", "s"), ("es", "t"), ("est", "</w>")))
  }

  test("trainMerges is deterministic and tie-breaks lexicographically") {
    val m1 = Bpe.trainMerges(counts, 10)
    val m2 = Bpe.trainMerges(counts.reverse, 10)
    assert(m1 === m2) // input order must not matter
    // all-tied pair counts: "ab" and "cd" both once — (a,b) < (c,d) wins first
    val tied = Bpe.trainMerges(Seq(("ab", 1L), ("cd", 1L)), 1)
    assert(tied === Vector(("a", "b")))
  }

  test("encodeWord round-trips: concatenated pieces spell the word + marker") {
    val merges = Bpe.trainMerges(counts, 8)
    for (w <- Seq("low", "lowest", "newest", "unseen", "xyz")) {
      val pieces = Bpe.encodeWord(w, merges)
      assert(pieces.mkString === w.map(_.toString).mkString + "</w>", s"word=$w pieces=$pieces")
    }
  }

  test("more merges never increase a word's piece count") {
    val m4 = Bpe.trainMerges(counts, 4)
    val m8 = Bpe.trainMerges(counts, 8)
    for (w <- Seq("low", "lower", "newest", "widest", "west"))
      assert(Bpe.encodeWord(w, m8).length <= Bpe.encodeWord(w, m4).length, w)
  }

  test("pieceStats: per-doc word totals match and piece totals are bounded") {
    val docs = Seq(
      (1L, "low low lower"),
      (2L, "newest widest"),
      (3L, "low newest newest")).toDF("doc_id", "text")
    val out = Bpe.pieceStats(docs, numMerges = 8).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    assert(out.map(r => (r._1, r._2)) === Array((1L, 3L), (2L, 2L), (3L, 3L)))
    // each word is between 1 piece and len+1 pieces
    val lens = Map(1L -> "lowlowlower", 2L -> "newestwidest", 3L -> "lownewestnewest")
    out.foreach { case (id, nWords, nPieces) =>
      assert(nPieces >= nWords, s"doc $id")
      assert(nPieces <= lens(id).length + nWords, s"doc $id")
    }
    // with enough merges the corpus' own frequent words collapse to few pieces:
    // "low</w>" is a single piece after (l,o),(lo,w),(low,</w>) fire
    val merges = Bpe.trainMerges(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), 10)
    assert(Bpe.encodeWord("low", merges).length <= 2)
  }

  test("wordCounts aggregates corpus tokens (the only distributed pass)") {
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs).as[(String, Long)].collect().toMap
    assert(wc === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }
}
