package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving bit encoding of a double: `encode(a) <ᵤ encode(b)` in
  * UNSIGNED 64-bit order iff `a < b` in IEEE total order (−∞ < … < −0.0 <
  * +0.0 < … < +∞ < NaN). The same trick Spark's radix sort uses for its
  * double sort prefixes (sign bit flipped for positives, all bits flipped
  * for negatives), exposed as a codegen'd scalar so value-domain
  * algorithms — the bounded-memory exact quantiles in
  * [[graft.operators.Quantiles]] — can binary-search a double range with
  * plain integer shifts on the column.
  */
case class DoubleSortBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_double_sort_bits"

  override protected def nullSafeEval(input: Any): Any =
    DoubleSortBits.encode(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.DoubleSortBits.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): DoubleSortBits =
    copy(child = newChild)
}

object DoubleSortBits {
  /** bits ^ (−(bits >>> 63) | MIN_VALUE): unsigned-sortable. */
  def encode(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    b ^ (-(b >>> 63) | java.lang.Long.MIN_VALUE)
  }

  /** Inverse of [[encode]]. */
  def decode(u: Long): Double = {
    val bits = if (u < 0) u ^ java.lang.Long.MIN_VALUE else ~u
    java.lang.Double.longBitsToDouble(bits)
  }
}
