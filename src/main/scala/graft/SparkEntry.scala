package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory lives in graft.ops.* ; each Q carries the Spark
  * implementation and (when SQL-expressible) its DuckDB oracle. */
object SparkEntry {

  /** Every named query, in registration order. */
  val registry: Seq[Q] =
    ops.Relational.queries ++
    ops.Advanced.queries ++
    ops.Events.queries ++
    ops.TextOps.queries ++
    ops.Similarity.queries ++
    ops.Imputation.queries ++
    ops.Ml.queries ++
    ops.Multimodal.queries ++
    ops.Sources.queries ++
    ops.Composition.queries ++
    ops.Retrieval.queries ++
    ops.Profiling.queries ++
    ops.Retail.queries ++
    ops.Stats.queries ++
    ops.Conformance.queries ++
    ops.Training.queries ++
    ops.Curation.queries ++
    ops.EmbedDiag.queries

  require(registry.map(_.name).distinct.size == registry.size,
    "duplicate query names in registry")
  // Bench emits each query under its bare NUMERIC prefix ("q00_x" → key
  // "0"; the driver's stdout tail is 2000 chars, full names overflow it) —
  // the numbers must stay unique ("q0_a" and "q00_b" would collide).
  require(registry.map(_.name.takeWhile(_ != '_').stripPrefix("q").toInt)
    .distinct.size == registry.size,
    "duplicate numeric query prefixes in registry")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
