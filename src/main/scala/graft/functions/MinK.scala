package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact bounded min-k selection as a typed `Aggregator`: keep the k
  * smallest (key, id) pairs seen, in one pass, with ≤ k tuples of state
  * per partial — the per-GROUP exact-k primitive behind q159's stratified
  * sampling. The two built-in routes both fail at scale: `collect_list`
  * + slice holds the whole group in one buffer (unbounded state), and a
  * `row_number() OVER (PARTITION BY group)` window sorts each group in a
  * single task (the q53 funnel when groups are few and huge). A k-bounded
  * mergeable state partial-aggregates map-side like any hash aggregate —
  * the same economics as [[SpaceSavingTopK]], but exact (min-k selection
  * is exactly mergeable; heavy-hitter counting is not).
  *
  * Ordering is (key, id) under Scala's default tuple ordering — for the
  * lowercase-hex md5 keys q159 feeds it, Java's UTF-16 comparison equals
  * the byte/ASCII order DuckDB's binary collation uses, so both engines
  * agree on every boundary. State INVARIANT: ascending-sorted, ≤ k.
  */
class MinKByKey(k: Int)
    extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]]
    with Serializable {
  require(k >= 1, "k must be >= 1")

  private val ord = implicitly[Ordering[(String, Long)]]

  override def zero: Seq[(String, Long)] = Seq.empty

  override def reduce(b: Seq[(String, Long)], v: (String, Long))
      : Seq[(String, Long)] =
    if (v == null || v._1 == null) b // Spark convention: nulls are ignored
    else if (b.length >= k && ord.gteq(v, b.last)) b // O(1) warm-path reject
    else ((b :+ v).sorted(ord)).take(k)

  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)])
      : Seq[(String, Long)] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else (a ++ b).sorted(ord).take(k)

  /** Ascending (key, id): position i is the rank-(i+1) sample. */
  override def finish(b: Seq[(String, Long)]): Seq[(String, Long)] = b

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
