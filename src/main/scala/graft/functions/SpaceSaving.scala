package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mutable Space-Saving state: a hash map of `value → [count, err]` plus a
  * lazily-rebuilt ordered index over `(count, value)` so both the hot path
  * (increment an existing counter) and the eviction path (replace the
  * minimum counter) are O(log k) instead of the O(k) scan a flat map needs.
  *
  * Why this exists (round 12): the first implementation kept the buffer as
  * an IMMUTABLE `Map` and found the eviction victim with `minBy` — an O(k)
  * scan plus a full persistent-map rebuild per incoming row. Below the
  * column's cardinality that path fires for most rows (an evicted value's
  * next occurrence is another miss), which turned q85 at sf1 (12M events,
  * ~10k users per group, k=2048) into 12M × O(2048) work — 33 s for what is
  * ~one scan. With the ordered index the same stream is 12M × O(log 2048).
  *
  * The eviction choice is bit-for-bit the old one: the minimum counter with
  * the lexicographically-smallest value as tie-break ((count, value)
  * ascending). The index is @transient and rebuilt on first use after
  * deserialization, so the serialized form stays just the counter map.
  */
class SpaceSavingBuffer(val k: Int) extends Serializable {

  /** value → Array(count, err); arrays mutate in place on the hot path. */
  val counters = new java.util.HashMap[String, Array[Long]]()

  @transient private var orderOrNull: java.util.TreeSet[Array[AnyRef]] = _

  /** (count, value) ascending; first() is the deterministic eviction
    * victim. Entries are Array(java.lang.Long, String) to avoid per-row
    * tuple boxing churn in the comparator. */
  private def order: java.util.TreeSet[Array[AnyRef]] = {
    if (orderOrNull == null) {
      orderOrNull = new java.util.TreeSet[Array[AnyRef]](
        new java.util.Comparator[Array[AnyRef]] with Serializable {
          def compare(a: Array[AnyRef], b: Array[AnyRef]): Int = {
            val c = java.lang.Long.compare(
              a(0).asInstanceOf[java.lang.Long].longValue(),
              b(0).asInstanceOf[java.lang.Long].longValue())
            if (c != 0) c
            else a(1).asInstanceOf[String].compareTo(b(1).asInstanceOf[String])
          }
        })
      counters.forEach { (v, ce) =>
        orderOrNull.add(Array(java.lang.Long.valueOf(ce(0)), v))
      }
    }
    orderOrNull
  }

  private def key(c: Long, v: String): Array[AnyRef] =
    Array(java.lang.Long.valueOf(c), v)

  def minCount: Long =
    if (counters.size < k) 0L
    else order.first()(0).asInstanceOf[java.lang.Long].longValue()

  def add(v: String): Unit = {
    val existing = counters.get(v)
    if (existing != null) {
      order.remove(key(existing(0), v))
      existing(0) += 1
      order.add(key(existing(0), v))
    } else if (counters.size < k) {
      counters.put(v, Array(1L, 0L))
      order.add(key(1L, v))
    } else {
      // evict the minimum counter; the newcomer inherits its count as
      // both estimate floor and error (it may have occurred that often
      // while untracked)
      val victim = order.pollFirst()
      val mc = victim(0).asInstanceOf[java.lang.Long].longValue()
      counters.remove(victim(1).asInstanceOf[String])
      counters.put(v, Array(mc + 1, mc))
      order.add(key(mc + 1, v))
    }
  }

  def put(v: String, c: Long, e: Long): Unit = {
    counters.put(v, Array(c, e))
    if (orderOrNull != null) orderOrNull.add(key(c, v))
  }

  def toSortedSeq: Seq[(String, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    counters.forEach((v, ce) => out += ((v, ce(0), ce(1))))
    out.sortBy { case (v, c, _) => (-c, v) }.toSeq
  }
}

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
  *
  * The buffer rides through shuffles as kryo-serialized state
  * ([[SpaceSavingBuffer]]); per-row updates mutate it in place at
  * O(log k), the property that makes the sketch viable below the column's
  * cardinality (see the buffer's scaladoc for the round-12 history).
  */
class SpaceSavingTopK(k: Int)
    extends Aggregator[String, SpaceSavingBuffer, Seq[(String, Long, Long)]]
    with Serializable {
  require(k >= 1, "k must be >= 1")

  override def zero: SpaceSavingBuffer = new SpaceSavingBuffer(k)

  override def reduce(b: SpaceSavingBuffer, v: String): SpaceSavingBuffer = {
    // Spark aggregate convention: null inputs are ignored (a null would
    // otherwise become a counter key and surface as (null, est, err))
    if (v != null) b.add(v)
    b
  }

  override def merge(a: SpaceSavingBuffer, b: SpaceSavingBuffer)
      : SpaceSavingBuffer = {
    if (a.counters.isEmpty) return b
    if (b.counters.isEmpty) return a
    val (minA, minB) = (a.minCount, b.minCount)
    val keys = new java.util.HashSet[String](a.counters.keySet())
    keys.addAll(b.counters.keySet())
    val union = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    keys.forEach { v =>
      val ca = a.counters.get(v)
      val cb = b.counters.get(v)
      val (xc, xe) = if (ca != null) (ca(0), ca(1)) else (minA, minA)
      val (yc, ye) = if (cb != null) (cb(0), cb(1)) else (minB, minB)
      union += ((v, xc + yc, xe + ye))
    }
    val kept =
      if (union.size <= k) union
      else union.sortBy { case (v, c, _) => (-c, v) }.take(k)
    val out = new SpaceSavingBuffer(k)
    kept.foreach { case (v, c, e) => out.put(v, c, e) }
    out
  }

  /** Counters sorted by estimate desc (value asc as tie-break):
    * (value, estimate, error). */
  override def finish(b: SpaceSavingBuffer): Seq[(String, Long, Long)] =
    b.toSortedSeq

  override def bufferEncoder: Encoder[SpaceSavingBuffer] =
    org.apache.spark.sql.Encoders.kryo[SpaceSavingBuffer]

  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long, Long)]]()
}
