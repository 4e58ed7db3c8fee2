package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

/** SQL-surface registration of graft's custom expressions, so
  * `spark.sql("SELECT graft_dot(a, b) ...")` works anywhere the library is
  * on the classpath:
  *
  *   - `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  *     (the standard extension hook), or
  *   - `GraftFunctions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two array<float> vectors"),
      (exprs: Seq[Expression]) => ArrayDotProduct(exprs(0), exprs(1))),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(shingles, k) - k-permutation MinHash signature"),
      (exprs: Seq[Expression]) => exprs(1) match {
        case Literal(n: Int, IntegerType) => MinHashSignature(exprs(0), n)
        case other => throw new IllegalArgumentException(
          s"graft_minhash: second argument must be an integer literal, got $other")
      }),
    (FunctionIdentifier("graft_sig_agreement"),
      info("graft_sig_agreement", "graft_sig_agreement(a, b) - count of agreeing slots between two array<bigint> MinHash signatures"),
      (exprs: Seq[Expression]) => SigAgreement(exprs(0), exprs(1))),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokens) - 64-bit SimHash fingerprint"),
      (exprs: Seq[Expression]) => SimHash64(exprs(0))),
    (FunctionIdentifier("graft_dot_int8"),
      info("graft_dot_int8", "graft_dot_int8(a, b) - integer dot product of two array<tinyint> code vectors"),
      (exprs: Seq[Expression]) => Int8DotProduct(exprs(0), exprs(1))),
    (FunctionIdentifier("graft_quantize_int8"),
      info("graft_quantize_int8", "graft_quantize_int8(v) - struct(qscale, codes, s1) int8 quantization of array<float>"),
      (exprs: Seq[Expression]) => Int8Quantize(exprs(0))),
    (FunctionIdentifier("graft_hyperplane_lsh"),
      info("graft_hyperplane_lsh", "graft_hyperplane_lsh(v, planes) - random-hyperplane sign signature of array<float>"),
      (exprs: Seq[Expression]) => exprs(1) match {
        case Literal(n: Int, IntegerType) => HyperplaneLSH(exprs(0), n)
        case other => throw new IllegalArgumentException(
          s"graft_hyperplane_lsh: second argument must be an integer literal, got $other")
      }),
    (FunctionIdentifier("graft_text_stats"),
      info("graft_text_stats", "graft_text_stats(text) - struct(toks, punct, stops, chars) one-pass quality statistics"),
      (exprs: Seq[Expression]) => TextStats(exprs(0))),
    (FunctionIdentifier("graft_bucket_screen"),
      info("graft_bucket_screen", "graft_bucket_screen(members, t) - surviving (id_a, id_b) pairs of an in-bucket int8 cosine screen at threshold t"),
      (exprs: Seq[Expression]) => exprs(1) match {
        case Literal(t: Double, DoubleType) => BucketScreenPairs(exprs(0), t)
        case Literal(t: org.apache.spark.sql.types.Decimal, _: DecimalType) =>
          BucketScreenPairs(exprs(0), t.toDouble)
        case other => throw new IllegalArgumentException(
          s"graft_bucket_screen: second argument must be a numeric literal, got $other")
      }),
    (FunctionIdentifier("graft_winnow"),
      info("graft_winnow", "graft_winnow(text, k, w) - winnowing rolling-hash fingerprint set"),
      (exprs: Seq[Expression]) => (exprs(1), exprs(2)) match {
        case (Literal(k: Int, IntegerType), Literal(w: Int, IntegerType)) =>
          Winnow(exprs(0), k, w)
        case other => throw new IllegalArgumentException(
          s"graft_winnow: k and w must be integer literals, got $other")
      }),
    (FunctionIdentifier("graft_char_diversity"),
      info("graft_char_diversity", "graft_char_diversity(text) - Simpson/Gini character diversity in [0, 1)"),
      (exprs: Seq[Expression]) => CharDiversity(exprs(0))),
    (FunctionIdentifier("graft_compress_ratio"),
      info("graft_compress_ratio", "graft_compress_ratio(text) - deflate compressed/raw byte ratio (repetition signal)"),
      (exprs: Seq[Expression]) => CompressRatio(exprs(0))),
    (FunctionIdentifier("graft_bpe_encode"),
      info("graft_bpe_encode", "graft_bpe_encode(word, merges) - BPE pieces of word under a trained array<array<string>> merge list"),
      (exprs: Seq[Expression]) => BpeEncode(exprs(0), exprs(1))),
    (FunctionIdentifier("graft_unigram_encode"),
      info("graft_unigram_encode", "graft_unigram_encode(word, model) - unigram-LM Viterbi pieces of word under a trained array<struct<piece,logp>> table"),
      (exprs: Seq[Expression]) => UnigramEncode(exprs(0), exprs(1))),
    (FunctionIdentifier("graft_char_ngrams"),
      info("graft_char_ngrams", "graft_char_ngrams(text, n) - all character n-grams (multiset, in order)"),
      (exprs: Seq[Expression]) => exprs(1) match {
        case Literal(n: Int, IntegerType) => CharNgrams(exprs(0), n)
        case other => throw new IllegalArgumentException(
          s"graft_char_ngrams: second argument must be an integer literal, got $other")
      }))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
