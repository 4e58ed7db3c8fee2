package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: recognize the idiomatic per-group top-k formulation
  *
  *   Filter(rn <= k, Window(rn := row_number() OVER (PARTITION BY p ORDER BY o), child))
  *
  * and feed the Window from [[GroupTopKPlan]] (same keys/order/k). The
  * window sort then runs on ≤ k rows per key instead of the full child —
  * users keep writing the standard pattern and get the bounded-heap plan.
  * Output schema and the rank column are preserved exactly; with a total
  * `ORDER BY` the result is identical (with ties, row_number is already
  * arbitrary among tied rows, and stays so).
  *
  * Register via [[GraftExtensions]] (`injectOptimizerRule`) or
  * `spark.experimental.extraOptimizations` ([[graft.Graft.enable]]).
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  private def rankLimit(cond: Expression, rnAttr: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rnAttr) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rnAttr) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rnAttr) => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rnAttr) => Some(k)
    case _ => None
  }

  private def isRowNumberOverOrder(e: NamedExpression): Option[(Seq[Expression], Seq[SortOrder])] =
    e match {
      case Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(partitionSpec, orderSpec, _)), _) if orderSpec.nonEmpty =>
        Some((partitionSpec, orderSpec))
      case _ => None
    }

  /** Conjunction-aware: `rn <= k AND p` rewrites too — the k-limit conjunct
    * is what bounds the window input; any other conjunct still filters
    * above the (recomputed, identical) rank column, so it sees exactly the
    * rows it would have kept. Multiple rank conjuncts take the tightest k.
    */
  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w @ Window(Seq(winExpr), _, _, child, _))
        if !child.isInstanceOf[GroupTopKPlan] =>
      isRowNumberOverOrder(winExpr) match {
        case Some((partitionSpec, orderSpec)) =>
          val rnAttr = winExpr.toAttribute
          val ks = splitConjuncts(cond).flatMap(c => rankLimit(c, rnAttr))
          ks.reduceOption(math.min) match {
            case Some(k) if k > 0 =>
              f.copy(child = w.copy(child = GroupTopKPlan(partitionSpec, orderSpec, k, child)))
            case _ => f
          }
        case None => f
      }
  }
}
