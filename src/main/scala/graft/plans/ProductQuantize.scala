package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encode: split an `array<float>` vector into
  * `codebooks.length` contiguous subvectors and emit, per subspace, the
  * index of the nearest sub-centroid (L2) — one compiled pass per row,
  * O(m × ksub × dsub) = O(ksub × dims) multiply-adds, zero shuffle.
  *
  * `codebooks(m)(code)(dimWithinSub)` ships inside the expression (like
  * [[NearestCentroid]]'s centroid table — model-sized, broadcast-shaped).
  * Ties resolve to the lowest code, so encoding is deterministic. The
  * output `array<tinyint>` is the PQ storage form: m bytes per vector vs
  * 4·dims for floats (32× at dims=64, m=8) — the compression that makes a
  * 100 TB embedding corpus scannable from memory (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * argmin ‖x − c‖² is evaluated as argmax (x·c − ‖c‖²/2): the subvector's
  * own norm is constant across candidate codes, and the ‖c‖²/2 terms are
  * precomputed once at construction.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "codebooks must be non-empty")
  require(codebooks.forall(_.length <= 128), "ksub must fit a tinyint code (≤ 128)")

  // ‖c‖²/2 per (subspace, code), precomputed driver-side
  private val halfNormSq: Array[Array[Double]] =
    codebooks.map(_.map(c => 0.5 * c.map(x => x * x).sum))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val m = codebooks.length
    val codes = new Array[Byte](m)
    var s = 0
    var base = 0
    while (s < m) {
      val cb = codebooks(s)
      val hn = halfNormSq(s)
      val dsub = cb(0).length
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var dot = 0.0
        var i = 0
        while (i < dsub && base + i < n) {
          dot += v.getFloat(base + i).toDouble * cent(i)
          i += 1
        }
        val score = dot - hn(c)
        if (score > bestScore) { bestScore = score; best = c }
        c += 1
      }
      codes(s) = best.toByte
      base += dsub
      s += 1
    }
    new GenericArrayData(codes.map(b => b: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) approximate cosine against ONE query, from PQ
  * codes alone — the probe never touches float vectors: per row it sums m
  * table lookups (query·sub-centroid, precomputed driver-side) and divides
  * by ‖q‖·‖x̂‖, where the reconstruction norm ‖x̂‖² is itself a lookup sum
  * (subspaces are orthogonal, so norms add). O(m) per row with zero
  * multiplies — the scan shape that lets one query rank a billion codes.
  *
  * `ipLut(sub)(code)` = q_sub · c_{sub,code}; `normSqLut(sub)(code)` =
  * ‖c_{sub,code}‖²; `qNorm` = ‖q‖. Zero reconstruction or query norm → 0.0
  * (matches the nullif convention of the exact paths: such rows rank last,
  * they don't poison the ordering with NaN).
  */
case class PqAdcScore(
    child: Expression,
    ipLut: Array[Array[Double]],
    normSqLut: Array[Array[Double]],
    qNorm: Double)
    extends UnaryExpression with CodegenFallback {
  require(ipLut.length == normSqLut.length, "LUT subspace counts must agree")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<tinyint> PQ codes, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_pq_adc_score"

  override protected def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    val m = math.min(codes.numElements(), ipLut.length)
    var ip = 0.0
    var normSq = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getByte(s).toInt & 0xff
      ip += ipLut(s)(c)
      normSq += normSqLut(s)(c)
      s += 1
    }
    val denom = qNorm * math.sqrt(normSq)
    if (denom == 0.0) 0.0 else ip / denom
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcScore =
    copy(child = newChild)
}
