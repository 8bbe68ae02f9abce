package graft

import org.apache.spark.sql.functions._

/** Source/layout semantics that q84's oracle can't isolate on its own:
  * parquet schema merging across drifted ingest batches (union-by-name,
  * null backfill, partition-column discovery). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema unions drifted batch schemas by name and nulls the gaps") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift_spec")
    Seq((1L, 10L), (2L, 20L)).toDF("id", "a")
      .write.mode("overwrite").parquet(s"$dir/feed/batch=0")
    Seq((3L, 30L, "x")).toDF("id", "b", "c")
      .write.mode("overwrite").parquet(s"$dir/feed/batch=1")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/feed")
    // union-by-name: all columns present, plus the discovered partition col
    assert(merged.columns.toSet == Set("id", "a", "b", "c", "batch"))
    val rows = merged.orderBy("id").collect()
    assert(rows.length == 3)
    // batch 0 rows: a populated, b/c null
    assert(rows(0).getAs[Long]("a") == 10L && rows(0).isNullAt(rows(0).fieldIndex("b")))
    // batch 1 row: b/c populated, a null
    assert(rows(2).getAs[Long]("b") == 30L && rows(2).getAs[String]("c") == "x"
      && rows(2).isNullAt(rows(2).fieldIndex("a")))
    // partition discovery typed the batch column from the directory names
    assert(rows(2).getAs[Int]("batch") == 1)
    // without mergeSchema the footer of one batch wins — the drift test
    // would silently read a projection, not the union (documents why the
    // option is load-bearing in q84)
    val single = spark.read.parquet(s"$dir/feed")
    assert(single.columns.toSet != merged.columns.toSet)
  }
}
