package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  And, Expression, GreaterThanOrEqual, LessThan, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (the `Rule[LogicalPlan]` leg of the extension trio —
  * expression / rule / strategy): unfold `interval_match(v, lo, hi)`
  * inside Filter conditions into native `lo <= v AND v < hi`.
  *
  * Why it matters: a custom Catalyst predicate is a black box to the
  * data-source translation layer, so a parquet scan under
  * `Filter(interval_match(price, 1000.0, 5000.0))` reads EVERY row
  * group. After the rewrite the condition is built-in comparisons:
  * DataSourceStrategy translates them to PushedFilters, row groups
  * whose min/max miss [lo, hi) are skipped, and the comparisons also
  * participate in every downstream optimization (range merging,
  * constant folding, filter inference). At a 100 TB date/price-sorted
  * table that is the difference between scanning the table and
  * scanning the matching row groups.
  *
  * Scoped to TOP-LEVEL CONJUNCTS of Filter conditions ONLY,
  * deliberately:
  *  - at a top-level conjunct position NULL and FALSE both drop the
  *    row, so the unfold is exactly semantics-preserving even with
  *    nullable bounds (the conjunction can yield FALSE where the
  *    ternary yields NULL — indistinguishable to a Filter). The same
  *    is NOT true deeper inside the condition: under `NOT(...)` or
  *    `coalesce(..., true)` that NULL→FALSE shift flips row
  *    retention, so nested occurrences are left untouched;
  *  - join conditions are left alone so [[RangeJoinStrategy]] still
  *    sees the `IntervalMatch` shape it pattern-matches to plan
  *    [[BroadcastRangeJoinExec]] (PlanAuditSpec pins that path).
  *
  * Injected via `injectOptimizerRule`, which lands in the operator-
  * optimization fixed-point batch — i.e. before physical planning's
  * filter translation, which is what makes the pushdown happen.
  */
object IntervalFilterUnfold extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val unfolded = conjuncts.map {
        case IntervalMatch(v, lo, hi) =>
          And(GreaterThanOrEqual(v, lo), LessThan(v, hi)): Expression
        case other => other
      }
      val rebuilt = unfolded.reduce(And)
      if (rebuilt.fastEquals(cond)) f else f.copy(condition = rebuilt)
  }
}
