package graft

import graft.pipeline.Walmart
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** End-to-end reference-workload parity on tiny Walmart-shaped fixtures,
  * including both corpus hazards: stores.csv with bare-CR line endings and
  * features.csv with "NA" sentinels (FIXTURES.md §A). */
class WalmartSpec extends SparkSpec {

  private lazy val rawDir: String = {
    val dir = Files.createTempDirectory("walmart_raw_")
    def write(name: String, content: String): Unit =
      Files.write(dir.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    val dates = Seq("2010-02-05", "2010-02-12", "2010-02-19", "2010-02-26",
      "2010-03-05", "2010-03-12")
    val trainRows = for {
      store <- Seq(1, 2); dept <- Seq(1); (d, i) <- dates.zipWithIndex
    } yield s"$store,$dept,$d,${(store * 1000 + i * 100).toDouble},${i == 2}"
    write("train.csv",
      ("Store,Dept,Date,Weekly_Sales,IsHoliday" +: trainRows).mkString("\n"))
    write("test.csv", Seq(
      "Store,Dept,Date,IsHoliday",
      "1,1,2010-03-19,false", "2,1,2010-03-19,false").mkString("\n"))
    // CR-only line endings, like the real stores.csv
    write("stores.csv",
      Seq("Store,Type,Size", "1,A,151315", "2,B,202307").mkString("\r"))
    val featRows = for { store <- Seq(1, 2); d <- dates :+ "2010-03-19" } yield {
      val md1 = if (d < "2010-03-01") "NA" else "100.5" // NA sentinel hazard
      s"$store,$d,42.31,2.572,$md1,NA,NA,NA,NA,211.096358,8.106,false"
    }
    val featHeader = "Store,Date,Temperature,Fuel_Price,MarkDown1,MarkDown2," +
      "MarkDown3,MarkDown4,MarkDown5,CPI,Unemployment,IsHoliday"
    write("features.csv", (featHeader +: featRows).mkString("\n"))
    dir.toString
  }

  private lazy val etlResult = {
    val train = Walmart.readCsv(spark, s"$rawDir/train.csv", Walmart.trainSchema)
    val test = Walmart.readCsv(spark, s"$rawDir/test.csv", Walmart.testSchema)
    val stores = Walmart.readCsv(spark, s"$rawDir/stores.csv",
      Walmart.storesSchema, Map("lineSep" -> "\r"))
    val features = Walmart.readCsv(spark, s"$rawDir/features.csv", Walmart.featuresSchema)
    Walmart.etl(train, test, stores, features)
  }

  test("CR-ended stores.csv parses to all rows") {
    val stores = Walmart.readCsv(spark, s"$rawDir/stores.csv",
      Walmart.storesSchema, Map("lineSep" -> "\r"))
    assert(stores.count() == 2)
    assert(stores.filter(col("Type") === "A").head().getAs[Int]("Size") == 151315)
  }

  test("ETL: joins, NA repair, imputation and calendar features line up") {
    val (train, test) = etlResult
    assert(train.count() == 12)
    val cols = train.columns.toSet
    assert(Set("Type", "Size", "Temperature", "CPI", "Year", "Month",
      "WeekOfYear", "DayOfWeek", "Weekly_Sales_lag1", "Weekly_Sales_lag4",
      "Weekly_Sales_roll4").subsetOf(cols))
    // "NA" became null, then median-imputed: MarkDown1 was NA before March,
    // 100.5 after → median of non-null = 100.5 fills the early weeks
    val md1 = train.select("MarkDown1").collect().map(_.getFloat(0))
    assert(md1.forall(_ == 100.5f))
    // MarkDown2..5 all-NA → no non-null median → stays null
    assert(train.filter(col("MarkDown2").isNotNull).count() == 0)
    // 2010-02-05 is a Friday (etl.py:52 convention: Sunday=1 → 6)
    val first = train.filter(col("Store") === 1 && col("Date") === "2010-02-05").head()
    assert(first.getAs[Int]("DayOfWeek") == 6)
    assert(first.getAs[Int]("WeekOfYear") == 5)
    // lag features: partition head zero-filled, later rows real
    assert(first.getAs[Double]("Weekly_Sales_lag1") == 0.0)
    val third = train.filter(col("Store") === 1 && col("Date") === "2010-02-19").head()
    assert(third.getAs[Double]("Weekly_Sales_lag1") == 1100.0)
    assert(third.getAs[Double]("Weekly_Sales_roll4") == 1050.0)
    // test side: no label, no lag columns, same join/impute features
    assert(test.count() == 2)
    assert(!test.columns.contains("Weekly_Sales"))
    assert(!test.columns.contains("Weekly_Sales_lag1"))
  }

  test("model: fits, scores validation and backfills lag columns on test") {
    val (train, test) = etlResult
    val (valScored, testScored, r2, rmse) =
      Walmart.model(train, test, numTrees = 3, maxDepth = 3)
    assert(testScored.count() == 2)
    assert(testScored.columns.contains("prediction"))
    assert(!rmse.isNaN && rmse >= 0)
    assert(!r2.isNaN)
    // predictions land inside the label's observed range (sanity)
    val preds = testScored.select("prediction").collect().map(_.getDouble(0))
    assert(preds.forall(p => p >= 500 && p <= 3000))
  }

  test("run(): full DAG writes parquet artifacts, partitioned not coalesced") {
    val outDir = Files.createTempDirectory("walmart_out_").toString
    Walmart.run(spark, rawDir, outDir)
    val merged = spark.read.parquet(s"$outDir/merged_train.parquet")
    assert(merged.count() == 12)
    assert(Files.list(java.nio.file.Paths.get(s"$outDir/merged_train.parquet"))
      .filter(p => p.getFileName.toString.startsWith("Store=")).count() == 2)
    assert(spark.read.parquet(s"$outDir/eda_null_counts.parquet").count() == 1)
    assert(spark.read.parquet(s"$outDir/test_predictions.parquet").count() == 2)
  }

  test("corpus pipeline: funnel is monotone and stages compose") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Composition.queries
      .find(_.name == "q200_corpus_pipeline").get.fn(spark, sf0001)
      .collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_chars"))).toMap
    assert(rows.keySet ==
      Set("0_all", "1_lang", "2_quality", "3_dedup", "4_mix"))
    val order = Seq("0_all", "1_lang", "2_quality", "3_dedup", "4_mix")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(rows(a)._1 >= rows(b)._1, s"funnel must shrink: $a -> $b")
      assert(rows(a)._2 >= rows(b)._2)
      case _ =>
    }
    assert(rows("0_all")._1 ==
      Tables.documents(spark, sf0001).count())
    assert(rows("1_lang")._1 == Tables.documents(spark, sf0001)
      .filter(col("lang") === "en").count())
    assert(rows("4_mix")._1 > 0, "the mix stage must keep something")
  }
}
