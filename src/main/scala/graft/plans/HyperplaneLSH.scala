package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH signature of an `array<float>` vector: bit p is
  * the sign of the dot product against pseudo-random hyperplane
  * `offset + p`, whose components are derived deterministically from
  * xxh64(dim, offset + p) — no driver-side randomness to ship, identical
  * on every executor. One compiled pass: O(dims × planes) multiply-adds
  * per row.
  *
  * `offset` selects a disjoint hyperplane family, so callers needing more
  * than 63 total planes (banded LSH at scale: per-band bucket count is
  * 2^planes and must grow with the corpus) stack independent signatures —
  * band b uses offset = b × planes — instead of bit-slicing one capped
  * signature.
  */
case class HyperplaneLSH(child: Expression, planes: Int, offset: Int = 0)
    extends UnaryExpression with CodegenFallback {
  require(planes > 0 && planes <= 63, "planes must be in [1, 63]")
  require(offset >= 0, "offset must be non-negative")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hyperplane_lsh"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var sig = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        // component in [-0.5, 0.5): same formula the SQL prototype used
        val h = XXH64.hashLong(i.toLong, (offset + p).toLong)
        dot += v.getFloat(i).toDouble * ((h % 1000L).toDouble / 1000.0)
        i += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLSH =
    copy(child = newChild)
}
