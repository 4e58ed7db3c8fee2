package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-diversity quality signal: Simpson/Gini impurity
  * 1 − Σ cᵢ² / n² over the character counts of a document. Near 0 for
  * degenerate repeated-character spam, high for natural text — the same
  * role Shannon entropy plays in corpus quality filters, chosen over
  * entropy because it is a RATIONAL function of integer counts: both
  * sides of the division are exact 64-bit integers, the single double
  * division is correctly rounded, so every engine computes the identical
  * value (a log-based entropy inherits libm's last-ulp variation and can
  * flip a rounded 6th decimal).
  *
  * One compiled pass per row: sort the chars (UTF-16 units; identical to
  * per-character splitting for the ASCII corpora this feeds), run-length
  * the sorted array. O(len log len), zero allocations beyond the copy.
  */
case class CharDiversity(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_char_diversity"

  override protected def nullSafeEval(input: Any): Any = {
    val chars = input.asInstanceOf[UTF8String].toString.toCharArray
    val n = chars.length
    if (n == 0) return 0.0
    java.util.Arrays.sort(chars)
    var sumSq = 0L
    var runStart = 0
    var i = 1
    while (i <= n) {
      if (i == n || chars(i) != chars(runStart)) {
        val c = (i - runStart).toLong
        sumSq += c * c
        runStart = i
      }
      i += 1
    }
    1.0 - sumSq.toDouble / (n.toLong * n.toLong).toDouble
  }

  override protected def withNewChildInternal(newChild: Expression): CharDiversity =
    copy(child = newChild)
}
