package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite unbounded edit-distance threshold predicates
  * into Spark's bounded form.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic program
  * per row and then throws most of that work away at the comparison;
  * `levenshtein(a, b, k)` abandons a pair as soon as the running distance
  * exceeds k (O(k·min(|a|,|b|)) — and returns −1 above the threshold, so
  * the predicate becomes `>= 0`. On a blocked fuzzy-match join (q116
  * shape) the comparator is the dominant per-row cost, and users writing
  * the natural unbounded form silently pay it; this rule gives every
  * session the bounded kernel for free.
  *
  * Equivalences (k a non-negative int literal; null inputs yield null →
  * filter-false under both forms, so three-valued logic is preserved):
  *  - `lev(a,b) <= k`  ⟺ `lev(a,b,k) >= 0`
  *  - `lev(a,b) <  k`  ⟺ `lev(a,b,k−1) >= 0`   (k ≥ 1)
  *  - `k >= lev(a,b)` / `k > lev(a,b)` — mirrored forms of the above.
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftExtensions]]) or on a live session via
  * `spark.experimental.extraOptimizations`. This is the (c) tier of the
  * extension ladder — a whole-plan `Rule[LogicalPlan]` — applied where it
  * genuinely beats expression-level composition: the user's query text
  * stays the portable ANSI form while the physical work changes.
  */
object BoundLevenshtein extends Rule[LogicalPlan] {

  private def bounded(l: Levenshtein, k: Int) =
    GreaterThanOrEqual(
      Levenshtein(l.left, l.right, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(l @ Levenshtein(_, _, None), Literal(k: Int, IntegerType))
          if k >= 0 => bounded(l, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), l @ Levenshtein(_, _, None))
          if k >= 0 => bounded(l, k)
      case LessThan(l @ Levenshtein(_, _, None), Literal(k: Int, IntegerType))
          if k >= 1 => bounded(l, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), l @ Levenshtein(_, _, None))
          if k >= 1 => bounded(l, k - 1)
    }
}
