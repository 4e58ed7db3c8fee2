package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (the SentencePiece/Kudo 2018 family), distributed
  * with exactly the [[Bpe]] split: ONE corpus scan into a capped
  * (word, count) aggregate, training driver-side over that model-sized
  * table, apply by encoding the distinct vocabulary once and
  * broadcast-joining per-word piece counts back — with a compiled per-row
  * Viterbi segmenter ([[graft.plans.UnigramEncode]]) covering words the
  * capped vocabulary misses. The corpus text is never re-scanned per EM
  * iteration and no training loop touches an executor.
  *
  * Training is Viterbi-EM (hard EM) rather than full forward–backward:
  * the E-step charges each word's whole count to its single best
  * segmentation. That keeps every accumulated statistic an exact Long —
  * so training is bit-for-bit deterministic regardless of input order or
  * partitioning — at a small quality cost vs soft EM that matters less
  * than the capped-seed approximation already does. Pruning keeps every
  * single-code-point piece (so any word stays encodable) plus the most
  * probable multi-char pieces, ties broken lexicographically.
  *
  * Reference scope: the reference pipeline has no tokenizer; this is part
  * of the LLM-training-data extension surface (SURVEY §2) beside [[Bpe]],
  * standing in for sentencepiece's unigram trainer.
  */
object Unigram {

  /** Log-prob charged per single-code-point piece that is NOT in the
    * model (characters never seen in training). A constant, not a
    * model-derived floor, so driver and compiled segmenter agree exactly.
    */
  val UnkLogProb: Double = -1e4

  private def isSingleCp(p: String): Boolean =
    p.nonEmpty && p.codePointCount(0, p.length) == 1

  /** A word's code points (splitting surrogate pairs would make unpaired
    * halves no piece could ever spell).
    */
  private def codePoints(word: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      b += word.substring(i, i + n)
      i += n
    }
    b.result()
  }

  /** Seed candidates: every code-point substring of length 1..maxPieceLen,
    * weighted by word count (the flat-file stand-in for sentencepiece's
    * suffix-array frequent-substring seed). All length-1 pieces are kept
    * unconditionally; multi-char candidates are capped at `seedSize` by
    * (count desc, piece asc) so seed state stays model-sized no matter the
    * corpus.
    */
  def seedCounts(counts: Seq[(String, Long)], maxPieceLen: Int,
                 seedSize: Int): Map[String, Long] = {
    val acc = scala.collection.mutable.Map.empty[String, Long]
    counts.foreach { case (word, n) =>
      val cps = codePoints(word)
      var i = 0
      while (i < cps.length) {
        var len = 1
        val sb = new StringBuilder
        while (len <= maxPieceLen && i + len <= cps.length) {
          sb.append(cps(i + len - 1))
          val piece = sb.toString
          acc(piece) = acc.getOrElse(piece, 0L) + n
          len += 1
        }
        i += 1
      }
    }
    val (single, multi) = acc.toSeq.partition { case (p, _) => isSingleCp(p) }
    (single ++ multi.sortBy { case (p, n) => (-n, p) }.take(seedSize)).toMap
  }

  /** Viterbi-best segmentation of `word` under piece log-probs: maximize
    * the summed log-prob over all covers; unknown single code points cost
    * [[UnkLogProb]]. Ties keep the segmentation whose LAST piece is
    * longest (scan start positions ascending, accept only strict
    * improvement), applied recursively by the backtrace — deterministic,
    * and identical to [[graft.plans.UnigramEncode]] (spec-differential).
    */
  def encodeWord(word: String, model: Map[String, Double],
                 maxPieceLen: Int): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    val cps = codePoints(word)
    val n = cps.length
    // char offset of each code-point boundary, so substring() is O(1)
    val pos = new Array[Int](n + 1)
    var i = 0
    while (i < n) { pos(i + 1) = pos(i) + cps(i).length; i += 1 }
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val piece = word.substring(pos(j), pos(i))
        val lp = model.get(piece) match {
          case Some(p) => p
          case None => if (i - j == 1) UnkLogProb else Double.NegativeInfinity
        }
        val cand = best(j) + lp
        if (cand > best(i)) { best(i) = cand; back(i) = j }
        j += 1
      }
      i += 1
    }
    var at = n
    val rev = List.newBuilder[String]
    while (at > 0) { rev += word.substring(pos(back(at)), pos(at)); at = back(at) }
    rev.result().reverse.toVector
  }

  /** Train a unigram LM on a (word, count) table: seed → `emIters` rounds
    * of Viterbi-EM → prune to `vocabSize` (all single-code-point pieces
    * plus the top multi-char pieces by final count) → final
    * renormalization. Deterministic: all statistics are Longs, all ties
    * lexicographic. Returns (piece → log-prob).
    */
  def train(counts: Seq[(String, Long)], vocabSize: Int, emIters: Int = 2,
            maxPieceLen: Int = 8, seedSize: Int = 1 << 16): Map[String, Double] = {
    require(vocabSize > 0 && emIters >= 1 && maxPieceLen >= 1)
    var pieceCounts = seedCounts(counts, maxPieceLen, seedSize)
    var it = 0
    while (it < emIters) {
      val model = logProbs(pieceCounts)
      val next = scala.collection.mutable.Map.empty[String, Long]
      counts.foreach { case (word, n) =>
        encodeWord(word, model, maxPieceLen).foreach { p =>
          next(p) = next.getOrElse(p, 0L) + n
        }
      }
      // every single-code-point piece survives EM with count ≥ 1, so any
      // word (including future unseen ones over the same alphabet) stays
      // encodable after pruning
      pieceCounts.keysIterator.filter(isSingleCp)
        .foreach(p => if (!next.contains(p)) next(p) = 1L)
      pieceCounts = next.toMap
      it += 1
    }
    val (single, multi) = pieceCounts.toSeq.partition { case (p, _) => isSingleCp(p) }
    val kept = single ++
      multi.sortBy { case (p, n) => (-n, p) }.take(math.max(0, vocabSize - single.size))
    logProbs(kept.toMap)
  }

  private def logProbs(pieceCounts: Map[String, Long]): Map[String, Double] = {
    val total = pieceCounts.valuesIterator.sum.toDouble
    pieceCounts.map { case (p, n) => p -> math.log(n / total) }
  }

  /** The full pipeline, shaped exactly like [[Bpe.pieceStats]]: capped
    * (word, count) collect (minCount floor + top-maxVocab, deterministic),
    * driver-side training, then per-document word and unigram-piece totals
    * via a broadcast join of the encoded vocabulary, with the compiled
    * Viterbi segmenter covering out-of-vocabulary words exactly — capping
    * shifts training statistics only (the tail mass real trainers drop),
    * never apply correctness.
    */
  def pieceStats(docs: DataFrame, vocabSize: Int = 200, emIters: Int = 2,
                 maxPieceLen: Int = 8, minCount: Long = 1, maxVocab: Int = 1 << 20,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val counts = Bpe.wordCounts(docs, textCol)
      .where(col("n") >= minCount)
      .orderBy(col("n").desc, col("word"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val model = train(counts, vocabSize, emIters, maxPieceLen)
    val modelSeq = model.toSeq.sortBy(_._1)
    val pieces = counts.map { case (w, _) =>
      (w, encodeWord(w, model, maxPieceLen).length.toLong)
    }
    val pieceDf = spark.createDataFrame(pieces).toDF("word", "n_pieces")
    docs
      .select(col(idCol), explode(Dedup.tokens(textCol)).as("word"))
      .where(col("word") =!= "")
      .join(broadcast(pieceDf), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_pieces"),
          size(graft.plans.Exprs.unigramEncode(col("word"), modelSeq)).cast("long")))
          .as("n_unigram_pieces"))
  }
}
