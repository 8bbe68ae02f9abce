package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter join pruning, mirroring the expression pair
  * Spark's `InjectRuntimeFilter` rule wires up internally
  * (`BloomFilterAggregate` building side / `BloomFilterMightContain`
  * probing side, both over `xxhash64` of the join key) — exposed as a
  * library operator so the pattern can be applied to plans the optimizer's
  * injection heuristics skip (e.g. when the build side isn't behind a
  * shuffle, or thresholds don't trigger).
  *
  * Scale shape: the filter is built by ONE distributed aggregate over the
  * build side (partial blooms merged pairwise — mergeable-sketch state like
  * the Space-Saving aggregator), collapses to a few-hundred-KB binary on
  * the driver, and rides into every probe-side scan task as a literal the
  * codegen'd `might_contain` probes per row. At 100 TB the probe side never
  * shuffles non-member rows — the bloom does at the ROW level what dynamic
  * partition pruning does at the partition level. False positives (rate
  * `fpp`) pass the pre-filter and are eliminated by the exact join that
  * must still follow; the operator therefore never changes results, only
  * exchanged volume.
  */
object BloomPrune {

  /** The serialized bloom of `keys(keyCol)`, built distributed. */
  def buildBloom(keys: DataFrame, keyCol: Column,
      expectedItems: Long = 1000000L, numBits: Long = 8388608L): Array[Byte] = {
    val hashed = new XxHash64(Seq(GraftSql.expression(keyCol)))
    val agg = new BloomFilterAggregate(hashed,
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    keys.agg(GraftSql.column(agg).as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** `probe` restricted to rows whose `probeKey` might be in
    * `build(buildKey)` — a pre-join reduction, NOT an exact semi join. */
  def filterByKeys(probe: DataFrame, probeKey: Column,
      build: DataFrame, buildKey: Column): DataFrame = {
    val bloom = buildBloom(build, buildKey)
    probe.filter(GraftSql.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(GraftSql.expression(probeKey))))))
  }
}
