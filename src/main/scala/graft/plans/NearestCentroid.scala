package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Index of the nearest centroid (by cosine) for an `array<float>` vector —
  * the IVF coarse-quantization assignment as a single map-side compiled
  * pass: O(nlist × dims) multiply-adds per row, zero shuffle, zero join.
  *
  * `centroids` ships inside the expression (serialized once per task, like
  * a broadcast variable) and MUST be L2-normalized by the caller: with unit
  * centroids, argmax cosine(v, c) = argmax v·ĉ — the row's own norm is a
  * constant factor and never needs computing. Ties resolve to the lowest
  * index, so assignment is deterministic. Null/empty vectors → index 0.
  *
  * This replaces the crossJoin+groupBy assignment (n×nlist rows
  * materialized, full-corpus re-shuffle) that a declarative formulation
  * would cost — the reason this is an expression, not a join.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty, "centroids must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_nearest_centroid"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val d = math.min(n, cent.length)
      var dot = 0.0
      var i = 0
      while (i < d) {
        dot += v.getFloat(i).toDouble * cent(i)
        i += 1
      }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}
