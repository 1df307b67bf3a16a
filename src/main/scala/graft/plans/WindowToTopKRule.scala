package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, AttributeReference, Expression, IntegerLiteral, LessThan, LessThanOrEqual,
  RowNumber, WindowExpression, WindowSpecDefinition
}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous "top-N per group" SQL idiom
  *
  *   Filter(rn <= k, Window(row_number() OVER (PARTITION BY p ORDER BY o) AS rn, child))
  *
  * into the sort-free [[GroupedTopK]] operator. Users keep writing the
  * standard window formulation; plans silently lose the per-partition
  * sort. Registered through [[graft.GraftExtensions]] (optimizer rule) or
  * [[GroupedTopK.register]] (`spark.experimental.extraOptimizations`).
  *
  * Deliberately strict match: exactly one window expression, a bare
  * row_number (no cast between it and the filter), and a literal bound —
  * anything else keeps Spark's plan.
  */
object WindowToTopKRule extends Rule[LogicalPlan] {

  private def bound(cond: Expression): Option[(AttributeReference, Int)] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)) => Some((a, k))
    case LessThan(a: AttributeReference, IntegerLiteral(k))        => Some((a, k - 1))
    case _                                                         => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(
          cond,
          Window(
            Seq(a @ Alias(WindowExpression(_: RowNumber, WindowSpecDefinition(part, order, _)), _)),
            _,
            _,
            child,
            _)) =>
      bound(cond) match {
        case Some((attr, k)) if attr.exprId == a.exprId && k >= 0 && part.nonEmpty =>
          GroupedTopK(part, order, k, a.toAttribute, child)
        case _ => f
      }
  }
}
