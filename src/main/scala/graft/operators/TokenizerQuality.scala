package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer quality emitted AS DATA — the driver-visible scorecard the
  * sketch families already have (q_ann_recall, q_pair_quality), for the
  * tokenizer family: both trained tokenizers ([[Bpe]], [[Unigram]]) are
  * scored on the SAME corpus in one result, so a pipeline operator can gate
  * on compression or fall back when the compiled OOV path misbehaves,
  * instead of trusting spec-only evidence.
  *
  * Two distributed passes, both bounded:
  *  - the TOKEN pass reuses the pieceStats shape (broadcast join of the
  *    model-sized encoded vocab, compiled encoder on misses) to total
  *    corpus words and pieces — pieces/word is the compression number a
  *    training pipeline budgets context length with;
  *  - the DISTINCT-WORD pass runs the compiled encoders
  *    ([[graft.plans.BpeEncode]], [[graft.plans.UnigramEncode]]) once per
  *    distinct word (never per occurrence) and checks them against the
  *    driver encoders where the word is in-vocab (`*_vocab_agree` — the
  *    compiled ≡ driver differential, corpus-wide) and for round-trip
  *    exactness everywhere (`concat(pieces) = word`, the OOV-path
  *    correctness the broadcast join can't see).
  *
  * Output: one row per tokenizer —
  * (tokenizer, model_size, n_words, n_pieces, pieces_per_word,
  *  n_distinct_words, oov_words, roundtrip_exact, vocab_agree, vocab_size).
  * At full health: roundtrip_exact = n_distinct_words and
  * vocab_agree = vocab_size.
  */
object TokenizerQuality {

  def score(docs: DataFrame, numMerges: Int = 50, vocabSize: Int = 200,
            emIters: Int = 2, maxPieceLen: Int = 8,
            minCount: Long = 1, maxVocab: Int = 1 << 20,
            textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    // the one capped (word, count) aggregate both trainers share — same
    // bound and determinism as Bpe.pieceStats / Unigram.pieceStats
    val counts = Bpe.wordCounts(docs, textCol)
      .where(col("n") >= minCount)
      .orderBy(col("n").desc, col("word"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = Bpe.trainMerges(counts, numMerges)
    val uni = Unigram.train(counts, vocabSize, emIters, maxPieceLen)
    val uniSeq = uni.toSeq.sortBy(_._1)
    // driver-side encodings of the training vocab — ONE model-sized
    // broadcast carrying both tokenizers' reference pieces
    val vocabDf = spark.createDataFrame(counts.map { case (w, _) =>
      (w, Bpe.encodeWord(w, merges), Unigram.encodeWord(w, uni, maxPieceLen))
    }).toDF("word", "bpe_driver", "uni_driver")

    val words = docs
      .select(explode(Dedup.tokens(textCol)).as("word"))
      .where(col("word") =!= "")

    // token pass: per-occurrence piece totals, compiled fallback on
    // broadcast-join misses (the pieceStats apply path, corpus-totaled)
    // isNotNull gates (not coalesce-of-size): with ANSI off, size(NULL)
    // is -1 rather than NULL, which would silently skip the compiled
    // fallback and count OOV occurrences as -1
    val tok = words.join(broadcast(vocabDf), Seq("word"), "left")
      .agg(
        count(lit(1)).as("n_words"),
        sum(when(col("bpe_driver").isNotNull, size(col("bpe_driver")))
          .otherwise(size(graft.plans.Exprs.bpeEncode(col("word"), merges)))
          .cast("long")).as("bpe_pieces"),
        sum(when(col("uni_driver").isNotNull, size(col("uni_driver")))
          .otherwise(size(graft.plans.Exprs.unigramEncode(col("word"), uniSeq)))
          .cast("long")).as("uni_pieces"))

    // distinct-word pass: compiled encoders run once per word; driver
    // comparison where the vocab broadcast hits, round-trip everywhere
    val dw = words.distinct()
      .join(broadcast(vocabDf), Seq("word"), "left")
      .withColumn("bpe_c", graft.plans.Exprs.bpeEncode(col("word"), merges))
      .withColumn("uni_c", graft.plans.Exprs.unigramEncode(col("word"), uniSeq))
      .agg(
        count(lit(1)).as("n_distinct_words"),
        count(when(col("bpe_driver").isNull, 1)).as("oov_words"),
        // BPE pieces spell word + the "</w>" end-of-word marker (the
        // classic Sennrich convention); unigram pieces spell the word
        count(when(concat_ws("", col("bpe_c")) === concat(col("word"), lit("</w>")), 1))
          .as("bpe_roundtrip_exact"),
        count(when(concat_ws("", col("uni_c")) === col("word"), 1))
          .as("uni_roundtrip_exact"),
        count(when(col("bpe_driver").isNotNull &&
          col("bpe_c") === col("bpe_driver"), 1)).as("bpe_vocab_agree"),
        count(when(col("uni_driver").isNotNull &&
          col("uni_c") === col("uni_driver"), 1)).as("uni_vocab_agree"))

    def row(name: String, modelSize: Long, pieces: String, rt: String,
            agree: String) = tok.crossJoin(dw).select(
      lit(name).as("tokenizer"),
      lit(modelSize).as("model_size"),
      col("n_words"),
      col(pieces).as("n_pieces"),
      round(col(pieces).cast("double") / col("n_words"), 6).as("pieces_per_word"),
      col("n_distinct_words"),
      col("oov_words"),
      col(rt).as("roundtrip_exact"),
      col(agree).as("vocab_agree"),
      lit(counts.size.toLong).as("vocab_size"))

    row("bpe", merges.length.toLong, "bpe_pieces",
        "bpe_roundtrip_exact", "bpe_vocab_agree")
      .unionByName(row("unigram", uni.size.toLong, "uni_pieces",
        "uni_roundtrip_exact", "uni_vocab_agree"))
  }
}
