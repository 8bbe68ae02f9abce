package graft

import org.apache.spark.sql.SparkSession

/** Dev utility (round 17, guide §7.2): dump `.explain("formatted")` for a
  * list of queries in ONE JVM — the per-query RunOne loop pays ~40 s of
  * sbt+session spin-up per plan, which makes a 15-query plan audit an
  * hour; this does it in one session. EXPLAIN ONLY, no execution (plans
  * print from the analyzed frame; AQE shows isFinalPlan=false shapes).
  * Queries whose construction itself runs jobs (ML fits, imperative
  * multi-job trainers) DO run those driver-side jobs during construction —
  * unavoidable, since the returned frame is built from their results.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.PlanDump /root/testdata/sf0.1 q00,q129"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val prefixes = args(1).split(",")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.openCostInBytes", (256 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    Tables.tuneVectorBatch(spark, sfDir)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    names.foreach { name =>
      println(s"===== PLAN $name =====")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        // queryExecution.explainString == df.explain("formatted"), captured
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { // NonFatal only (ADVICE r17): an OOM/linkage error must
        // kill the run, not produce misleading partial dumps from a
        // corrupted JVM
        case scala.util.control.NonFatal(e) =>
          println(s"EXPLAIN FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
