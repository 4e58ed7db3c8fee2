package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row unigram-LM Viterbi segmentation:
  * `(word string, model array<struct<string, double>>)` → `array<string>`
  * of pieces maximizing the summed piece log-prob, unknown single code
  * points at [[graft.operators.Unigram.UnkLogProb]] — identical to the
  * driver-side [[graft.operators.Unigram.encodeWord]] (spec-differential):
  * same code-point boundaries, same ascending-start scan with strict
  * improvement (ties keep the longest last piece).
  *
  * This is the APPLY path for words the vocabulary broadcast doesn't
  * cover, exactly like [[BpeEncode]] for BPE: the (piece, log-prob) table
  * is the model — foldable, parsed into a hash map once per task, shipped
  * inside the plan like the k-means / PQ codebook expressions. The scan
  * window is the model's own longest piece, so segmentation never probes
  * substrings no model entry could match.
  *
  * CodegenFallback like [[BpeEncode]]: per-row cost is
  * O(word × maxPieceLen) hash probes in a tight compiled loop already.
  */
case class UnigramEncode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(s: StructType, _))
          if s.length == 2 && s(0).dataType == StringType &&
            s(1).dataType == DoubleType && right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(s: StructType, _))
          if s.length == 2 && s(0).dataType == StringType && s(1).dataType == DoubleType =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable model (the trained piece table)")
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (string, array<struct<string, double>>), got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_unigram_encode"

  // the model is foldable state — parse it once per task, not per row
  @transient private lazy val (model: java.util.HashMap[String, java.lang.Double],
                               maxPieceLen: Int) = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val m = new java.util.HashMap[String, java.lang.Double](arr.numElements() * 2)
    var maxLen = 1
    var i = 0
    while (i < arr.numElements()) {
      val row = arr.getStruct(i, 2)
      val piece = row.getUTF8String(0).toString
      m.put(piece, row.getDouble(1))
      val cpLen = piece.codePointCount(0, piece.length)
      if (cpLen > maxLen) maxLen = cpLen
      i += 1
    }
    (m, maxLen)
  }

  override protected def nullSafeEval(wordAny: Any, modelAny: Any): Any = {
    val word = wordAny.asInstanceOf[UTF8String].toString
    if (word.isEmpty) return new GenericArrayData(new Array[AnyRef](0))
    // code-point boundary char offsets
    var n = 0
    var c = 0
    while (c < word.length) { c += Character.charCount(word.codePointAt(c)); n += 1 }
    val pos = new Array[Int](n + 1)
    var i = 0
    c = 0
    while (c < word.length) {
      c += Character.charCount(word.codePointAt(c)); i += 1; pos(i) = c
    }
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    i = 1
    while (i <= n) { best(i) = Double.NegativeInfinity; i += 1 }
    i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val piece = word.substring(pos(j), pos(i))
        val lpBoxed = model.get(piece)
        val lp =
          if (lpBoxed != null) lpBoxed.doubleValue()
          else if (i - j == 1) graft.operators.Unigram.UnkLogProb
          else Double.NegativeInfinity
        val cand = best(j) + lp
        if (cand > best(i)) { best(i) = cand; back(i) = j }
        j += 1
      }
      i += 1
    }
    var at = n
    var count = 0
    while (at > 0) { at = back(at); count += 1 }
    val out = new Array[AnyRef](count)
    at = n
    var k = count - 1
    while (at > 0) {
      out(k) = UTF8String.fromString(word.substring(pos(back(at)), pos(at)))
      at = back(at)
      k -= 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnigramEncode =
    copy(left = newLeft, right = newRight)
}
