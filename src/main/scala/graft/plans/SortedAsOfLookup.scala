package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Binary search over a per-key SORTED array<struct<t:bigint, v:double>>:
  * returns v of the greatest t ≤ the probe timestamp, null when every entry
  * is later. This is the probe kernel of the broadcast as-of join — the
  * dimension's whole timeline rides the broadcast hash relation as one
  * sorted array per key, and each fact row resolves its at-or-before value
  * in O(log |timeline|) with ZERO fact-side shuffle or sort.
  */
case class SortedAsOfLookup(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StructType(Array(a, b)), _), LongType)
        if a.dataType == LongType && b.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<struct<bigint,double>>, bigint), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def prettyName: String = "graft_asof_lookup"

  override protected def nullSafeEval(arrIn: Any, tsIn: Any): Any = {
    val arr = arrIn.asInstanceOf[ArrayData]
    val ts = tsIn.asInstanceOf[Long]
    var lo = 0
    var hi = arr.numElements() - 1
    var best = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val t = arr.getStruct(mid, 2).getLong(0)
      if (t <= ts) { best = mid; lo = mid + 1 } else hi = mid - 1
    }
    if (best < 0) null
    else {
      // a null dim VALUE must surface as null, exactly like the
      // union+window as-of path — getDouble on a null slot silently yields
      // 0.0
      val s = arr.getStruct(best, 2)
      if (s.isNullAt(1)) null else s.getDouble(1)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedAsOfLookup =
    copy(left = newLeft, right = newRight)
}
