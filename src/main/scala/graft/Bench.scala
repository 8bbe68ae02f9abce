package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up (uncounted): first query in a fresh JVM otherwise absorbs
    // one-time costs — noop-sink init, codegen/JIT, parquet footer reads —
    // that belong to the session, not that query. Warm against the BENCH
    // sf dir (not sf0.001): q00 runs first in sorted order and was the
    // only query paying the target dir's footer reads inside its timer.
    ops.Relational.flagship(spark, sfDir).write.mode("overwrite").format("noop").save()
    // Same for MLlib: the first estimator fit in a JVM pays class loading,
    // BLAS instance probing and tree/kmeans codegen that every later fit
    // skips. A micro-fit on 64 in-memory rows (~2s) keeps that session cost
    // out of whichever ML query happens to run first.
    locally {
      import org.apache.spark.sql.functions._
      val tiny = spark.range(64).select(
        col("id").cast("double").as("y"),
        (col("id") % 3).cast("string").as("c"),
        rand(7).as("x1"), rand(11).as("x2"))
      graft.pipeline.Model.fitPredict(tiny, "y", Seq("c", "x1", "x2"),
        numTrees = 2, maxDepth = 2)._2.unpersist(blocking = false)
      val vecs = tiny.select(
        org.apache.spark.ml.functions.array_to_vector(array(col("x1"), col("x2")))
          .as("features"))
      new org.apache.spark.ml.clustering.KMeans().setK(2).setSeed(1L).setMaxIter(2)
        .fit(vecs).transform(vecs).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
    }
    // sorted: deterministic run order, comparable across rounds
    val errors = scala.collection.mutable.ListBuffer.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: forces full evaluation of every output column. A bare
      // count() lets Catalyst prune expensive expressions (a global
      // aggregate's row count needs none of them), under-measuring any
      // query whose hot columns are prunable.
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          errors += name -> s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}"
          false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      // isolate queries from each other: drop caches a query left behind
      // (they'd distort later queries' memory profile) — outside the timer,
      // like the driver's own per-query accounting
      spark.catalog.clearCache()
      // failed query → negated time: visibly broken in the JSON instead of
      // masquerading as a (suspiciously fast) success
      name -> (if (ok) secs else -secs)
    }
    // keep the sorted Seq order in the JSON — toMap would hash-scramble it;
    // millisecond precision keeps the line short (a consumer that only
    // retains the tail of the output should still see most of the map).
    // Locale.ROOT: the f interpolator uses the JVM default locale, which in
    // comma-decimal locales would print "1,234" and corrupt the JSON.
    def ms(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    // headline total = successful queries only; failures stay visible as
    // negated per-query entries + n_errors (a broken bench must never look
    // faster than a working one)
    val total = results.map(_._2).filter(_ > 0).sum
    val errJson = errors.map { case (k, v) =>
      // escape control chars too — Spark exception messages are multi-line
      val esc = v.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      }
      s"\"" + k + "\":\"" + esc + "\""
    }.mkString("{", ",", "}")
    // headline fields repeated AFTER the queries map: a consumer that keeps
    // only the tail of the output still sees the totals
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_errors":${errors.size},"errors":$errJson,"sf":"$sfDir","n_queries":${results.size},"total_sec":${ms(total)}}""")
    spark.stop()
  }
}
