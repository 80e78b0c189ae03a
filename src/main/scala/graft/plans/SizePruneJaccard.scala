package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, Expression, GreaterThanOrEqual, Literal, Multiply, Size}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.NativeText.JaccardSets

/** Set-similarity SIZE filtering as a Catalyst optimizer rule — the
  * standard pre-filter of similarity-join literature applied to the
  * exact-verify stage: `jaccard_sets(a, b) >= t` implies
  * `|a| >= t·|b|` AND `|b| >= t·|a|` (intersection ≤ min size, union ≥
  * max size, so j ≤ min/max). The rewrite prepends those two O(1)
  * size comparisons to the conjunction; `And` short-circuits left to
  * right, so wildly mismatched candidate pairs skip the O(|a|+|b|)
  * sort-merge intersection entirely. Semantics are UNCHANGED — the
  * guard is implied by the comparison it guards (the 86-query DuckDB
  * gate runs with the rule active).
  *
  * The pattern intentionally matches only a Filter whose condition IS
  * the bare `jaccard >= t` comparison: the rewritten node is an `And`,
  * so the rule is idempotent under fixed-point optimizer batches. It
  * also requires BOTH operands to be plain attributes — duplicating a
  * computed child (e.g. an inline `hashed_shingles` call, which is
  * CodegenFallback with no common-subexpression elimination) into the
  * guard would re-run it per row and pessimize instead of pruning.
  *
  * Registered via `graft.functions.GraftExtensions`
  * (`spark.sql.extensions`) — the `SparkSessionExtensions` injection
  * path — or ad hoc through `spark.experimental.extraOptimizations`.
  */
object SizePruneJaccard extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(
        geq @ GreaterThanOrEqual(j: JaccardSets, Literal(t: Double, DoubleType)),
        child) if t > 0.0 &&
          j.left.isInstanceOf[Attribute] && j.right.isInstanceOf[Attribute] =>
      def sz(e: Expression): Expression =
        Cast(Size(e, legacySizeOfNull = false), DoubleType)
      val tl = Literal(t, DoubleType)
      val guard = And(
        GreaterThanOrEqual(sz(j.left), Multiply(tl, sz(j.right))),
        GreaterThanOrEqual(sz(j.right), Multiply(tl, sz(j.left))))
      Filter(And(guard, geq), child)
  }
}
