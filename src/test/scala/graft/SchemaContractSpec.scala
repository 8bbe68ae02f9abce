package graft

import org.apache.spark.sql.types._

/** Cross-engine dtype-symmetry contract (round-14, VERDICT r13 directive 2).
  *
  * The q300 red was a pure dtype artifact: DuckDB's HUGEINT oracle column
  * lands in pandas as float64 while the Spark parquet column is int64 —
  * values exact, driver hash different. The DuckDB half of the gate lives
  * in tools/check.py (it needs a live DuckDB to type the oracle SQL); this
  * spec is the Spark-side mirror: every registered query's OUTPUT schema
  * must use only types whose pandas rendering is unambiguous and identical
  * to DuckDB's rendering of the matching SQL type.
  *
  * Banned in outputs:
  *  - DecimalType: pandas renders Spark decimals as `object` (Decimal
  *    instances) or float depending on the reader, and DuckDB DECIMAL
  *    coerces to float64 — any exact-integer decimal should be cast to
  *    long, any fractional one to double, BEFORE the result surfaces.
  *  - FloatType: float32 vs the oracle's float64 disagree in the low bits
  *    after pandas conversion; promote to double at the output boundary.
  * Internal plans may use whatever they like (the Hamilton apportionment
  * quota forms in DECIMAL(38,0) per the overflow rule) — only the surfaced
  * schema is constrained.
  */
class SchemaContractSpec extends SparkSpec {

  private def stable(dt: DataType): Boolean = dt match {
    case _: DecimalType | FloatType => false
    case ArrayType(et, _)           => stable(et)
    case MapType(k, v, _)           => stable(k) && stable(v)
    case StructType(fs)             => fs.forall(f => stable(f.dataType))
    case _                          => true
  }

  test("no query surfaces a decimal or float32 column (pandas-ambiguous)") {
    GraftExtensions.register(spark)
    // same exclusion set as PlanQualitySpec's repo-wide sweep: these run a
    // full workload at CONSTRUCTION time (fits / complete streaming runs);
    // their outputs are counts/doubles pinned by their own specs.
    val heavyEager = Set("q40_rf_regression", "q41_kmeans_embeddings",
      "q76_stream_sessions", "q106_stream_dedup",
      "q127_tws_sessions", "q128_walmart_dag")
    val offenders = SparkEntry.registry
      .filterNot(q => heavyEager(q.name)).flatMap { q =>
        val bad = q.fn(spark, sf0001).schema.fields
          .filterNot(f => stable(f.dataType))
        if (bad.isEmpty) None
        else Some(s"${q.name}(${bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")})")
      }
    assert(offenders.isEmpty,
      s"pandas-ambiguous output columns in: ${offenders.mkString("; ")} — " +
        "cast to long/double at the output boundary and mirror the cast " +
        "in the oracle SQL")
  }
}
