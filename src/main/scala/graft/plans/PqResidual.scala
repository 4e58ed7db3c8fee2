package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Residual against an assigned centroid: r = x − c[centIdx], one compiled
  * pass — the encode-side half of residual IVF-PQ (quantize what the coarse
  * cell DIDN'T explain; residuals are smaller than raw vectors, so the same
  * m/ksub budget spends its resolution on finer structure). A zip_with
  * subtraction would interpret a lambda per dimension per corpus row.
  */
case class SubtractCentroid(left: Expression, right: Expression,
                            centroids: Array[Array[Double]])
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, int), got $other")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def prettyName: String = "graft_subtract_centroid"

  override protected def nullSafeEval(vec: Any, idx: Any): Any = {
    val v = vec.asInstanceOf[ArrayData]
    val c = centroids(idx.asInstanceOf[Int])
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = (v.getFloat(i).toDouble - (if (i < c.length) c(i) else 0.0)).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubtractCentroid =
    copy(left = newLeft, right = newRight)
}

/** Residual-IVF-PQ asymmetric cosine for ONE query: reconstruct-free
  * scoring of x̂ = cent[cell] + r̂(codes) from lookup tables only —
  *
  *   q·x̂   = qCentDot(cell) + Σ_m ipLut(m)(code)
  *   ‖x̂‖² = centNormSq(cell) + 2·Σ_m centCross(cell)(m)(code)
  *                            + Σ_m resNormSq(m)(code)
  *
  * (subspaces are orthogonal, so residual norms add; the centroid×residual
  * cross terms come from the per-cell table, precomputed driver-side for
  * the probed cells only). O(m) adds per row, zero multiplies — the same
  * probe cost as plain PQ, with the residual's tighter quantization.
  */
case class PqResidualScore(
    left: Expression,  // codes: array<tinyint>
    right: Expression, // cent_idx: int
    ipLut: Array[Array[Double]],
    resNormSq: Array[Array[Double]],
    qCentDot: Array[Double],
    centNormSq: Array[Double],
    centCross: Array[Array[Array[Double]]],
    qNorm: Double)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ByteType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<tinyint>, int), got $other")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_pq_residual_score"

  override protected def nullSafeEval(codesAny: Any, idxAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val cell = idxAny.asInstanceOf[Int]
    val cross = centCross(cell)
    val m = math.min(codes.numElements(), ipLut.length)
    var ip = qCentDot(cell)
    var normSq = centNormSq(cell)
    var s = 0
    while (s < m) {
      val c = codes.getByte(s).toInt & 0xff
      ip += ipLut(s)(c)
      normSq += 2.0 * cross(s)(c) + resNormSq(s)(c)
      s += 1
    }
    val denom = qNorm * math.sqrt(math.max(normSq, 0.0))
    if (denom == 0.0) 0.0 else ip / denom
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqResidualScore =
    copy(left = newLeft, right = newRight)
}
