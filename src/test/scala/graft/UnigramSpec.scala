package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // est-family corpus: "est" and "west"-ish substrings dominate
  private val counts = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("train keeps every single code point and caps multi-char pieces") {
    val model = Unigram.train(counts, vocabSize = 10, emIters = 2, maxPieceLen = 4)
    val alphabet = counts.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(alphabet.subsetOf(model.keySet))
    val multi = model.keySet.filter(_.length > 1)
    assert(multi.size <= 10 - alphabet.size)
    // log-probs are a normalized distribution's logs: all negative
    model.values.foreach(lp => assert(lp < 0.0))
  }

  test("train is deterministic and input-order invariant") {
    val m1 = Unigram.train(counts, vocabSize = 12, emIters = 2)
    val m2 = Unigram.train(counts.reverse, vocabSize = 12, emIters = 2)
    assert(m1 === m2)
  }

  test("encodeWord round-trips: concatenated pieces spell the word") {
    val model = Unigram.train(counts, vocabSize = 16, emIters = 2)
    for (w <- Seq("low", "lowest", "newest", "unseen", "xyz", "hélloé", "a😀b", "😀😀")) {
      val pieces = Unigram.encodeWord(w, model, 8)
      assert(pieces.mkString === w, s"word=$w pieces=$pieces")
      assert(pieces.forall(_.nonEmpty))
    }
    assert(Unigram.encodeWord("", model, 8) === Vector.empty)
  }

  test("frequent words collapse to few pieces; piece count never exceeds code points") {
    val model = Unigram.train(counts, vocabSize = 32, emIters = 3, maxPieceLen = 8)
    // "newest" dominates the corpus — its pieces should be far fewer than
    // its letters (the whole word is itself a seed candidate)
    assert(Unigram.encodeWord("newest", model, 8).length <= 2)
    for (w <- Seq("low", "lower", "newest", "widest", "unseen"))
      assert(Unigram.encodeWord(w, model, 8).length <= w.length, w)
  }

  test("a larger vocab never segments a trained word into more pieces") {
    val small = Unigram.train(counts, vocabSize = 8, emIters = 2)
    val large = Unigram.train(counts, vocabSize = 64, emIters = 2)
    for (w <- counts.map(_._1))
      assert(Unigram.encodeWord(w, large, 8).length <=
        Unigram.encodeWord(w, small, 8).length, w)
  }

  test("UnigramEncode expression matches encodeWord differentially (incl. multibyte + OOV)") {
    val model = Unigram.train(counts :+ ("hélloé", 4L) :+ ("a😀b", 2L),
      vocabSize = 32, emIters = 2, maxPieceLen = 6)
    val modelSeq = model.toSeq.sortBy(_._1)
    val words = Seq("low", "lowest", "newest", "unseen", "xyz", "hélloé",
      "a😀b", "😀😀", "ééé", "")
    val got = words.toDF("w")
      .select(col("w"), graft.plans.Exprs.unigramEncode(col("w"), modelSeq).as("p"))
      .as[(String, Seq[String])].collect().toMap
    for (w <- words)
      assert(got(w) === Unigram.encodeWord(w, model, 6), s"word=$w")
  }

  test("graft_unigram_encode is callable from SQL") {
    graft.plans.GraftFunctions.register(spark)
    val model = Unigram.train(counts, vocabSize = 16, emIters = 2)
    val modelSql = model.toSeq.sortBy(_._1)
      .map { case (p, lp) => s"named_struct('piece', '$p', 'logp', CAST($lp AS DOUBLE))" }
      .mkString("array(", ", ", ")")
    val out = spark.sql(s"SELECT graft_unigram_encode('newest', $modelSql) AS p")
      .as[Seq[String]].head()
    assert(out === Unigram.encodeWord("newest", model, 8))
  }

  test("pieceStats: per-doc word totals match and piece totals are bounded") {
    val docs = Seq(
      (1L, "low low lower"),
      (2L, "newest widest"),
      (3L, "low newest newest")).toDF("doc_id", "text")
    val out = Unigram.pieceStats(docs, vocabSize = 32).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    assert(out.map(r => (r._1, r._2)) === Array((1L, 3L), (2L, 2L), (3L, 3L)))
    val lens = Map(1L -> "lowlowlower", 2L -> "newestwidest", 3L -> "lownewestnewest")
    out.foreach { case (id, nWords, nPieces) =>
      assert(nPieces >= nWords, s"doc $id") // ≥ one piece per word
      assert(nPieces <= lens(id).length.toLong, s"doc $id") // ≤ one piece per char
    }
  }

  test("pieceStats: a non-binding cap reproduces the uncapped result exactly") {
    val docs = Seq(
      (1L, "low low lower"),
      (2L, "newest widest"),
      (3L, "low newest newest")).toDF("doc_id", "text")
    val uncapped = Unigram.pieceStats(docs, vocabSize = 32)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    // 5 distinct words; a cap of 5 with minCount 1 is non-binding
    val capped = Unigram.pieceStats(docs, vocabSize = 32, minCount = 1, maxVocab = 5)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(capped === uncapped)
    // a BINDING cap still encodes every word exactly (compiled Viterti
    // fallback) — word totals identical, piece totals still bounded
    val tight = Unigram.pieceStats(docs, vocabSize = 32, maxVocab = 2)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(tight.map(r => (r._1, r._2)) === uncapped.map(r => (r._1, r._2)))
    tight.foreach { case (id, nWords, nPieces) =>
      assert(nPieces >= nWords && nPieces <= Map(1L -> 11L, 2L -> 12L, 3L -> 15L)(id), s"doc $id")
    }
  }
}
