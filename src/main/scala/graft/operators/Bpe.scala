package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application, distributed the
  * way production tokenizer pipelines actually run (HF tokenizers, GPT-2's
  * original trainer): the corpus is scanned ONCE into a (word, count)
  * aggregate — vocab-bounded, the only thing that shuffles — merges are
  * trained driver-side over that count table (model-sized state, exactly
  * like the k-means / PQ codebooks elsewhere in this package), and the
  * trained tokenizer is applied by encoding the DISTINCT vocabulary once
  * and broadcast-joining per-word piece counts back to the corpus. At
  * 100 TB the text is never re-scanned per merge and no merge loop ever
  * touches an executor: train cost is O(vocab), apply cost is one
  * broadcast join.
  *
  * Reference scope: the reference pipeline has no tokenizer; this is part
  * of the LLM-training-data extension surface (SURVEY §2), standing in for
  * the count-then-train loop of sentencepiece/HF BPE.
  */
object Bpe {

  /** The distributed pass: whitespace-token counts over the corpus. The
    * exchange carries (word, partial count) — partial-aggregated map-side,
    * so its volume is bounded by distinct words per partition, not corpus
    * tokens.
    */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(Dedup.tokens(textCol)).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** A word as its BPE symbol sequence: code points plus the terminal
    * end-of-word marker (the classic Sennrich et al. 2015 formulation).
    * Code points, not UTF-16 chars — splitting a surrogate pair would
    * make two unpaired-half "symbols" no encoder could ever emit.
    */
  private def symbols(word: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      b += word.substring(i, i + n)
      i += n
    }
    (b += "</w>").result()
  }

  /** Train `numMerges` merges on a (word, count) table. Deterministic:
    * the winning pair is the highest total count, ties to the
    * lexicographically smallest pair — so the merge list (the model) is
    * reproducible regardless of input order or partitioning.
    */
  def trainMerges(counts: Seq[(String, Long)], numMerges: Int): Vector[(String, String)] = {
    var words: Map[Vector[String], Long] =
      counts.groupBy(c => symbols(c._1)).map { case (s, cs) => s -> cs.map(_._2).sum }
    val merges = Vector.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        words = words.map { case (syms, n) => (applyMerge(syms, best), n) }
        i += 1
      }
    }
    merges.result()
  }

  private def applyMerge(syms: Vector[String], m: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == m._1 && syms(j + 1) == m._2) {
        out += (m._1 + m._2); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Encode one word with a trained merge list (merges apply in training
    * order — the standard greedy BPE segmenter).
    */
  def encodeWord(word: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(symbols(word))((syms, m) => applyMerge(syms, m))

  /** The full pipeline: train on the corpus' own counts, then per-document
    * whitespace-token and BPE-piece totals.
    *
    * The driver-side state is CAPPED, the way real BPE trainers bound
    * theirs (HF/sentencepiece `min_frequency` + `vocab_size`): only words
    * with count ≥ `minCount`, and at most the `maxVocab` most frequent
    * (ties broken by word, so the cap is deterministic), are collected —
    * a 100 TB web corpus has ~10⁸ distinct "words" (typos, URLs, hex
    * blobs) and an uncapped collect is a driver OOM. The frequent vocab
    * is encoded driver-side and broadcast-joined; words OUTSIDE the cap
    * still encode EXACTLY — the compiled per-row segmenter
    * (graft.plans.BpeEncode, the same merge table as a foldable literal)
    * covers them after the broadcast join misses, so capping changes
    * training statistics only (negligibly, since the tail it drops is
    * exactly the mass real trainers drop), never apply correctness.
    */
  def pieceStats(docs: DataFrame, numMerges: Int = 50,
                 minCount: Long = 1, maxVocab: Int = 1 << 20,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val counts = wordCounts(docs, textCol)
      .where(col("n") >= minCount)
      .orderBy(col("n").desc, col("word"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = trainMerges(counts, numMerges)
    val pieces = counts.map { case (w, _) => (w, encodeWord(w, merges).length.toLong) }
    val pieceDf = spark.createDataFrame(pieces).toDF("word", "n_pieces")
    docs
      .select(col(idCol), explode(Dedup.tokens(textCol)).as("word"))
      .where(col("word") =!= "")
      .join(broadcast(pieceDf), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_pieces"),
          size(graft.plans.Exprs.bpeEncode(col("word"), merges)).cast("long")))
          .as("n_bpe_pieces"))
  }
}
