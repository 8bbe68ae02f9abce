package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer-time choice between two exact-equivalent plans — the
  * Catalyst tier of the adaptive kernel switches in
  * `TextOps.exactJaccardPairsFrom` (direct shared-shingle join vs the
  * PPJoin prefix-filtered plan) and `TextOps.simhashPairsFromSets`
  * (8-chunk join vs the 4×16-bit one-error-variant scheme).
  *
  * The driver-side form of those switches runs a `count()` at plan
  * CONSTRUCTION time — one extra Spark job per query, paid even when
  * the consumer never executes the frame. This node defers the decision
  * to the optimizer: construction is free (both candidate plans are
  * built lazily — zero jobs, TextOpsSpec pins it with a listener), and
  * when an action optimizes the consuming query the rule reads the
  * input frame's Catalyst size estimate (`stats.sizeInBytes` — the SAME
  * statistic Spark's own JoinSelection consults for broadcast
  * decisions) and collapses the node to one branch. Both branches are
  * EXACT (identical output — the plan-equivalence specs), so the choice
  * is pure cost, like every other stats-driven decision the optimizer
  * already makes.
  *
  * Mechanics: a binary logical node whose children are the two complete
  * candidate plans. It rides the whole default optimizer run untouched
  * (unknown to every builtin rule, children optimized normally), then
  * the injected rule — `experimental.extraOptimizations` live-session,
  * `injectOptimizerRule` via [[graft.GraftExtensions]] — replaces it
  * with the chosen child. The small-side branch owns the node's output
  * attribute ids; choosing the large-side branch re-maps through a
  * Project of aliases carrying the declared ids, so downstream
  * attribute references never dangle. The unchosen branch simply drops
  * out of the tree — never checkpointed, never executed.
  *
  * `statsChild` is the INPUT frame both branches read (not a child of
  * this node — only its statistics are consulted). Thresholds are in
  * estimated bytes, calibrated per call site to the same measured
  * crossover as the row-count threshold they replace: the estimate
  * descends from the parquet scan through the projections, so it scales
  * linearly with the corpus exactly like the row counts do.
  */
case class AdaptivePlan(
    small: LogicalPlan,
    large: LogicalPlan,
    statsChild: LogicalPlan,
    thresholdBytes: BigInt) extends LogicalPlan {
  override def children: Seq[LogicalPlan] = Seq(small, large)
  override def output: Seq[Attribute] = small.output
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): LogicalPlan =
    copy(small = newChildren(0), large = newChildren(1))
}

/** Collapses [[AdaptivePlan]] to its chosen branch. Runs in the
  * user-rule batch, AFTER the default optimization of both children. */
object AdaptivePlanRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case AdaptivePlan(small, large, statsChild, thresholdBytes) =>
      if (statsChild.stats.sizeInBytes <= thresholdBytes) small
      else Project(small.output.zip(large.output).map { case (o, n) =>
        Alias(n, o.name)(exprId = o.exprId)
      }, large)
  }
}

object AdaptivePlan {
  /** Install [[AdaptivePlanRule]] on a live session (idempotent); the
    * spark.sql.extensions path goes through [[graft.GraftExtensions]]. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(AdaptivePlanRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AdaptivePlanRule
}
