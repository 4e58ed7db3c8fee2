package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row BPE segmentation: `(word string, merges array<array<string>>)`
  * → `array<string>` of pieces, applying the trained merge list in
  * training order to `chars(word) :+ "</w>"` — the classic Sennrich
  * greedy segmenter, identical to the driver-side
  * [[graft.operators.Bpe.encodeWord]] (spec-differential).
  *
  * This is the APPLY path for words the vocabulary broadcast doesn't
  * cover: batch pieceStats encodes the frequent vocab once driver-side
  * and broadcast-joins it, but capped vocabs (the 100 TB shape) and
  * streams of novel tokens need the merge table applied per row. The
  * merge list is the model — foldable, parsed once per task, shipped
  * inside the plan exactly like the k-means / PQ codebook expressions.
  *
  * CodegenFallback like [[MinHashSignature]]: the kernel is already a
  * tight compiled loop; the per-row cost is O(merges × symbols) string
  * compares, which generated Java would not improve.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(ArrayType(StringType, _), _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(ArrayType(StringType, _), _)) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable merge list (the trained model)")
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (string, array<array<string>>), got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_encode"

  // the merge list is foldable model state — parse it once per task, not
  // per row
  @transient private lazy val merges: Array[(String, String)] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { i =>
      val pair = arr.getArray(i)
      (pair.getUTF8String(0).toString, pair.getUTF8String(1).toString)
    }
  }

  override protected def nullSafeEval(wordAny: Any, mergesAny: Any): Any = {
    val word = wordAny.asInstanceOf[UTF8String].toString
    // symbols = code points + terminal marker (Sennrich et al. 2015)
    val syms = new java.util.ArrayList[String](word.length + 1)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(word.substring(i, i + n))
      i += n
    }
    syms.add("</w>")
    var m = 0
    while (m < merges.length) {
      val (a, b) = merges(m)
      var j = 0
      while (j < syms.size - 1) {
        if (syms.get(j) == a && syms.get(j + 1) == b) {
          syms.set(j, a + b)
          syms.remove(j + 1)
          // the merged symbol may immediately pair with the PREVIOUS one
          // under the same merge — rescan from it (matches the driver
          // segmenter's left-to-right single pass semantics: that pass
          // re-checks position j against the new symbol, not j - 1, so
          // stay at j)
        } else {
          j += 1
        }
      }
      m += 1
    }
    val out = new Array[AnyRef](syms.size)
    var k = 0
    while (k < syms.size) {
      out(k) = UTF8String.fromString(syms.get(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)
}
