package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's test corpus (see /root/repo/TESTDATA.md and
  * FIXTURES.md §B). One parquet file per table under `\$dir/<name>.parquet`.
  *
  * Design notes for scale:
  *  - Explicit, deterministic handling of parquet physical types beats
  *    schema inference (SURVEY.md §1) — in particular `events.ts` has been
  *    generated both as INT64 TIMESTAMP(NANOS,false) (which Spark's parquet
  *    reader rejects outright) and as plain TIMESTAMP(MICROS). The loader
  *    branches on the type it actually reads: a long column is rebuilt as a
  *    µs TIMESTAMP_NTZ, floor-truncated exactly like DuckDB's ns→µs cast so
  *    the oracle agrees; a native timestamp column is only normalized to
  *    TIMESTAMP_NTZ so every downstream query sees one stable type.
  *  - All loads are plain `spark.read.parquet` scans: column pruning and
  *    predicate pushdown reach the scan untouched (no eager work here).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Oracle parity: session must be UTC for LTZ<->NTZ conversions below.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    name match {
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(s"$dir/events.parquet")
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            // ns-as-long corpus: integer `div` keeps full precision (double
            // division would lose low bits at 2^60 magnitudes); floor
            // semantics match DuckDB's ns→µs cast.
            raw.withColumn("ts",
              timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
          case _ =>
            // µs-timestamp corpus: already sub-µs-free; only pin the type.
            raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
        }
      case other =>
        spark.read.parquet(s"$dir/$other.parquet")
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view (for spark.sql users). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
