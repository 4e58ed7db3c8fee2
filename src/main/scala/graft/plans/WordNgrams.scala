package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a token array, one compiled pass — the shingle
  * generator feeding MinHash. A transform/slice/concat_ws higher-order
  * pipeline pays per-element lambda interpretation (~µs each); this builds
  * each n-gram with byte-level concatenation and dedups via a hash set.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0, "n must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_word_ngrams"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val count = math.max(m - n + 1, 1)
    val seen = new mutable.HashSet[UTF8String]
    val out = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < count) {
      val last = math.min(i + n, m)
      var gram = toks.getUTF8String(i)
      var j = i + 1
      while (j < last) {
        gram = UTF8String.concat(gram, space, toks.getUTF8String(j))
        j += 1
      }
      if (seen.add(gram)) out += gram
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}
