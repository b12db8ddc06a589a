package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule completing the custom-operator ladder (Expression →
  * aggregate → LogicalPlan/Strategy/SparkPlan → Rule[LogicalPlan]):
  * rewrites the ubiquitous window top-k idiom
  *
  * {{{ Project(p, Filter(rn <= k, Window(rn := row_number() over
  *     (partition by keys order by ord), keys, ord, child))) }}}
  *
  * into the native [[TopKPerKey]] operator whenever the rank column is
  * dropped by the projection — so ANY user query written with
  * `row_number().over(...) <= k` gets the bounded-heap partial/final
  * plan (≤ k rows per key per partition cross the shuffle) instead of
  * shuffling and sorting the whole input.
  *
  * Safety conditions: exactly one window expression, and it is
  * row_number with the standard (ROWS, UNBOUNDED PRECEDING, CURRENT ROW)
  * frame; the filter is a single `rn ≤ k` / `rn < k` comparison against
  * an integer literal; the projection never references rn; the partition
  * spec is non-empty (global top-k already plans as
  * TakeOrderedAndProject, and an empty clustering would collapse to one
  * partition). Row-number ties among equal sort keys are nondeterministic
  * in BOTH forms, so the rewrite preserves every deterministic query
  * (graft queries always carry a unique tie-break key).
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def rowNumberAlias(w: Window): Option[Alias] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)) =>
      Some(a)
    case _ => None
  }

  /** The k of a `rn ≤ k`-shaped predicate, if that is the whole filter.
    * `rn = 1` (the first-row-per-group idiom) is `rn ≤ 1`.
    */
  private def kOf(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType)) if a.exprId == rn => Some(v)
    // v > Int.MinValue guards the decrement: `rn < Int.MinValue` must stay
    // an always-false filter, not overflow into top-Int.MaxValue-per-key.
    case LessThan(a: AttributeReference, Literal(v: Int, IntegerType)) if a.exprId == rn && v > Int.MinValue => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: AttributeReference) if a.exprId == rn => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: AttributeReference) if a.exprId == rn && v > Int.MinValue => Some(v - 1)
    case EqualTo(a: AttributeReference, Literal(1, IntegerType)) if a.exprId == rn => Some(1)
    case EqualTo(Literal(1, IntegerType), a: AttributeReference) if a.exprId == rn => Some(1)
    case _ => None
  }

  private def references(es: Seq[Expression], id: ExprId): Boolean =
    es.exists(_.exists {
      case ar: AttributeReference => ar.exprId == id
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, Filter(cond, w: Window)) =>
      (for {
        alias <- rowNumberAlias(w)
        if w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty
        k <- kOf(cond, alias.exprId)
        if k >= 1 && !references(projectList, alias.exprId)
      } yield Project(projectList,
        TopKPerKey(w.partitionSpec, w.orderSpec, k, w.child))
      ).getOrElse(p)
  }
}
