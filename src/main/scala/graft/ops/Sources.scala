package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** CSV source coverage (SURVEY.md §2.1 S1): the reference ingests CSVs with
  * two hazards our reader must tolerate — bare-CR line endings
  * (stores.csv, FIXTURES.md §A) and the literal string "NA" standing in for
  * null in numeric columns (features.csv, etl.py:96-106).
  *
  * q47 round-trips the nation table through exactly that shape: a CR-only,
  * "NA"-poisoned CSV written to a temp dir, read back with an explicit
  * StructType (never inferSchema — SURVEY.md §4.2), repaired with the
  * ANSI-safe when() guard, and aggregated. The oracle computes the same
  * aggregate from the parquet table with the same deterministic "NA"
  * injection rule, so the entire CSV path — write, CR parse, sentinel
  * repair, cast — is hash-verified.
  */
object Sources {

  /** Deterministic CSV bytes for the nation table: regionkey becomes "NA"
    * whenever nationkey % 5 == 0; lines joined with bare CR. */
  private def nationCsv(rows: Seq[(Int, String, Int)]): String = {
    val header = "n_nationkey,n_name,n_regionkey"
    val lines = rows.sortBy(_._1).map { case (k, name, r) =>
      val reg = if (k % 5 == 0) "NA" else r.toString
      s"$k,$name,$reg"
    }
    (header +: lines).mkString("\r") // CR-only endings, like stores.csv
  }

  val queries: Seq[Q] = Seq(
    Q("q47_csv_source",
      """WITH injected AS (
        |  SELECT n_nationkey,
        |         CASE WHEN n_nationkey % 5 = 0 THEN NULL
        |              ELSE CAST(n_regionkey AS FLOAT) END AS r
        |  FROM nation)
        |SELECT count(*) AS n_rows,
        |       count(r) AS n_nonnull,
        |       CAST(round(sum(r), 1) AS DOUBLE) AS sum_region,
        |       CAST(round(avg(r), 4) AS DOUBLE) AS avg_region
        |FROM injected""".stripMargin) { (s, d) =>
      val rows = Tables.nation(s, d)
        .select("n_nationkey", "n_name", "n_regionkey").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
      val dir = Files.createTempDirectory("graft_csv_")
      val file = dir.resolve("nation.csv")
      Files.write(file, nationCsv(rows).getBytes(StandardCharsets.UTF_8))
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", StringType))) // "NA"-poisoned: read as string
      val csv = s.read
        .option("header", "true")
        .option("lineSep", "\r") // tolerate bare-CR endings (stores.csv)
        .option("mode", "PERMISSIVE")
        .schema(schema)
        .csv(file.toString)
      graft.pipeline.Etl.naRepair(csv, Seq("n_regionkey"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("n_regionkey")).as("n_nonnull"),
          round(sum(col("n_regionkey")), 1).cast("double").as("sum_region"),
          round(avg(col("n_regionkey")), 4).cast("double").as("avg_region"))
    }
  )
}
