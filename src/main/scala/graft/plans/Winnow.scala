package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken): polynomial
  * rolling hash over every k-byte gram (O(n), one multiply-add per byte),
  * then the minimum hash of each w-gram window, deduplicated — a compact,
  * position-robust fingerprint set that overlaps heavily between documents
  * sharing any substring ≥ k + w − 1 bytes. The plagiarism/near-dup
  * primitive that pure whole-text hashing can't provide.
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0, "k and w must be positive")

  private val B = 1000003L // polynomial base (odd, large)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * B + (bytes(i) & 0xff); i += 1 }
      return new GenericArrayData(Array(h))
    }
    val m = n - k + 1
    val grams = new Array[Long](m)
    // B^(k-1) with wrapping arithmetic (mod 2^64)
    var bk = 1L
    var j = 0
    while (j < k - 1) { bk *= B; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
    grams(0) = h
    i = k
    while (i < n) {
      h = (h - (bytes(i - k) & 0xff) * bk) * B + (bytes(i) & 0xff)
      grams(i - k + 1) = h
      i += 1
    }
    // winnow: min per window of w grams, rightmost min on ties; dedup
    // consecutive re-picks of the same position
    val out = Array.newBuilder[Long]
    var lastPicked = -1
    var start = 0
    val lastStart = m - w
    if (lastStart < 0) {
      // document shorter than one window: single global min
      var best = 0
      var g = 1
      while (g < m) { if (grams(g) <= grams(best)) best = g; g += 1 }
      return new GenericArrayData(Array(grams(best)))
    }
    while (start <= lastStart) {
      var best = start
      var g = start + 1
      while (g < start + w) { if (grams(g) <= grams(best)) best = g; g += 1 }
      if (best != lastPicked) {
        out += grams(best)
        lastPicked = best
      }
      start += 1
    }
    new GenericArrayData(out.result())
  }

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}
