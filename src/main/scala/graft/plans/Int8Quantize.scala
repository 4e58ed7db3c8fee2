package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Symmetric int8 quantization of an `array<float>` vector in ONE compiled
  * pass: scale = max|x|/127, codes = round(x/scale) as tinyint, s1 = Σ|code|
  * (the term the exact-screen error bound needs). Returns
  * struct<qscale:double, codes:array<tinyint>, s1:bigint>; zero vectors get
  * a NULL qscale (codes all zero), mirroring the nullif the SQL prototype
  * used.
  *
  * The higher-order-function formulation of the same thing (aggregate +
  * transform + aggregate) costs three interpreted lambda sweeps per row and,
  * worse, re-evaluates after the grid explode in cosinePairsExact — this
  * expression is why quantization stays off the profile.
  */
case class Int8Quantize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("qscale", DoubleType, nullable = true),
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false),
    StructField("s1", LongType, nullable = false)))

  override def prettyName: String = "graft_quantize_int8"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i).toDouble)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val codes = new Array[Byte](n)
    var s1 = 0L
    if (maxAbs == 0.0) {
      InternalRow(null, new GenericArrayData(codes.map(b => b: Any)), 0L)
    } else {
      val scale = maxAbs / 127.0
      i = 0
      while (i < n) {
        val q = math.round(v.getFloat(i).toDouble / scale)
        codes(i) = q.toByte
        s1 += math.abs(q)
        i += 1
      }
      InternalRow(scale, new GenericArrayData(codes.map(b => b: Any)), s1)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}
