package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Statistics}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD

/** Honest `sizeInBytes` for eagerly-checkpointed frames.
  *
  * Every `localCheckpoint(true)` in this engine leaves a [[LogicalRDD]]
  * leaf whose statistics are the ORIGIN plan's Catalyst estimate — for
  * an exploded shingle stream that estimate descends from the parquet
  * scan bytes and lands near ONE byte per row, ~100× below the
  * materialized size (measured: 7.7 MB estimate vs 866 MB in the block
  * manager at sf3). The poison is not the AdaptivePlan thresholds
  * (calibrated against the same wrong unit) but Spark's own
  * JoinSelection: an 866 MB shingle frame estimated at 7.7 MB slides
  * under `spark.sql.autoBroadcastJoinThreshold`, and the hot self-join
  * builds an 866 MB broadcast hash table.
  *
  * The fix is the statistic, not the strategy: an eager checkpoint has
  * ALREADY materialized its blocks, so the block manager knows the real
  * size — `SparkContext.getRDDStorageInfo` (public DeveloperApi) returns
  * per-RDD mem+disk bytes with zero extra jobs. [[fix]] rewrites a
  * LogicalRDD whose RDD has storage info to carry
  * `originStats = Statistics(realBytes)`, scaled up proportionally when
  * eviction left only part of the partitions cached. Non-checkpointed
  * LogicalRDDs (no storage entry) and other nodes pass through.
  *
  * WHY THIS IS NOT AN OPTIMIZER RULE (round-13 lesson, kept as a
  * warning): LogicalRDD's case-class equality spans only its first
  * parameter list — `originStats` is curried and EXCLUDED from
  * equals() — so a rebuilt leaf compares equal-but-not-eq to the
  * original and `TreeNode.mapChildren` DISCARDS the replacement when
  * rebuilding its parent ("child unchanged"). An optimizer rule that
  * swaps the leaf therefore silently no-ops for any leaf that sits
  * below another node, i.e. always. Instead
  * [[org.apache.spark.sql.GraftSql.eagerCkpt]] applies [[fix]] at
  * CHECKPOINT TIME, before any parent captures the poisoned node, and
  * [[AdaptivePlanRule]] applies it to its detached `statsChild`
  * reference (not part of the query tree, so no parent to fight).
  *
  * Trade-off, documented not hidden: the rebuilt node drops the origin
  * plan's constraint set (`originConstraints` is constructor-private),
  * giving up redundant-filter elimination on checkpointed frames —
  * optimization-only metadata, never correctness. Column-level stats
  * are not carried either; none existed on the origin estimate. */
object HonestRddStats {

  /** Rewrite every storage-backed [[LogicalRDD]] in `plan` to carry its
    * materialized size.
    *
    * Hand-rolled recursion instead of `transformUp`, deliberately:
    * `mapChildren` keeps the OLD child whenever the replacement is
    * `==`-equal (LogicalRDD equality spans only its first parameter
    * list, so a stats-only swap always is) — with `transformUp` this
    * method was a silent no-op for any leaf below the root (ADVICE r13).
    * All round-13 call sites passed bare checkpointed frames, where root
    * == leaf and the trap never fired; a caller passing e.g.
    * `ckpt.select(...)` as the stats reference would have silently read
    * the poisoned estimate. Forcing `withNewChildren` when a child's
    * IDENTITY changed (even though its value compares equal) makes the
    * rewrite reach every depth. */
  def fix(plan: LogicalPlan): LogicalPlan = plan match {
    case lr: LogicalRDD => withStorageStats(lr)
    case p =>
      val kids = p.children.map(fix)
      if (kids.zip(p.children).forall { case (n, o) => n eq o }) p
      else p.withNewChildren(kids)
  }

  private def withStorageStats(lr: LogicalRDD): LogicalPlan = {
    val session = SparkSession.active.asInstanceOf[classic.SparkSession]
    session.sparkContext.getRDDStorageInfo.find(_.id == lr.rdd.id) match {
      case Some(i) if i.numCachedPartitions > 0 && i.memSize + i.diskSize > 0 =>
        val cached = i.memSize + i.diskSize
        // partial eviction: scale the cached bytes to the full partition
        // count — an underestimate here would re-poison JoinSelection in
        // exactly the direction this fixer exists to prevent
        val full =
          if (i.numCachedPartitions < i.numPartitions)
            BigInt(cached) * i.numPartitions / i.numCachedPartitions
          else BigInt(cached)
        LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
          lr.outputOrdering, lr.isStreaming, lr.stream)(
          session, Some(Statistics(sizeInBytes = full)), None)
      case _ => lr
    }
  }
}
