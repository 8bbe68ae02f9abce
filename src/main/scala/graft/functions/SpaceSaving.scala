package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy-hitters sketch (Metwally, Agrawal, El Abbadi,
  * "Efficient computation of frequent and top-k elements in data streams",
  * ICDT 2005) as a typed Spark `Aggregator`: at most `k` counters of
  * bounded size per partition, merged associatively across partitions —
  * the streaming/distributed answer to "which values dominate this column"
  * when the exact per-value group-count (q10/q65's collect) no longer fits.
  *
  * Estimates are UPPER bounds on true counts (`est − err` is the matching
  * lower bound). Classic guarantees, preserved by the merge below:
  *  - any value with true frequency > n/k is present in the sketch;
  *  - est(v) ≥ true_count(v) ≥ est(v) − err(v).
  * With k at or above the column's cardinality no eviction ever happens and
  * the sketch degenerates to exact counts (err = 0) — which is what makes a
  * DuckDB hash-oracle possible on a low-cardinality column (q74).
  *
  * Merge strategy: a value absent from one side is credited that side's
  * minimum counter (its worst-case undercount there) with the same amount
  * added to the error term, then the union is truncated back to the top-k
  * counters — the standard parallel Space-Saving merge, upper bounds stay
  * upper bounds.
  */
class SpaceSavingTopK(k: Int)
    extends Aggregator[String, Map[String, (Long, Long)], Seq[(String, Long, Long)]]
    with Serializable {
  require(k >= 1, "k must be >= 1")

  override def zero: Map[String, (Long, Long)] = Map.empty

  private def minCount(b: Map[String, (Long, Long)]): Long =
    if (b.size < k) 0L else b.valuesIterator.map(_._1).min

  override def reduce(b: Map[String, (Long, Long)], v: String)
      : Map[String, (Long, Long)] =
    // Spark aggregate convention: null inputs are ignored (a null would
    // otherwise become a Map key and surface as a (null, est, err) counter)
    if (v == null) b
    else b.get(v) match {
      case Some((c, e)) => b.updated(v, (c + 1, e))
      case None if b.size < k => b.updated(v, (1L, 0L))
      case None =>
        // evict the minimum counter; the newcomer inherits its count as
        // both estimate floor and error (it may have occurred that often
        // while untracked)
        val (mv, (mc, _)) = b.minBy { case (key, (c, _)) => (c, key) }
        (b - mv).updated(v, (mc + 1, mc))
    }

  override def merge(a: Map[String, (Long, Long)], b: Map[String, (Long, Long)])
      : Map[String, (Long, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val (minA, minB) = (minCount(a), minCount(b))
    val union = (a.keySet ++ b.keySet).iterator.map { v =>
      val (ca, ea) = a.getOrElse(v, (minA, minA))
      val (cb, eb) = b.getOrElse(v, (minB, minB))
      v -> (ca + cb, ea + eb)
    }.toMap
    if (union.size <= k) union
    else union.toSeq
      .sortBy { case (v, (c, _)) => (-c, v) }
      .take(k).toMap
  }

  /** Counters sorted by estimate desc (value asc as tie-break):
    * (value, estimate, error). */
  override def finish(b: Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
    b.toSeq.map { case (v, (c, e)) => (v, c, e) }
      .sortBy { case (v, c, _) => (-c, v) }

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, (Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long, Long)]]()
}
