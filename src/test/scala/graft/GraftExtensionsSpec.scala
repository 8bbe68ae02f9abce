package graft

import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions surface: custom Catalyst expressions resolve
  * as SQL functions, both via the `spark.sql.extensions` injector on a fresh
  * session and via GraftExtensions.register on a live one, and agree with
  * the Column API. */
class GraftExtensionsSpec extends SparkSpec {

  test("register() exposes the kernels to spark.sql, matching the Column API") {
    val s = spark.newSession()
    GraftExtensions.register(s)
    import s.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    df.createOrReplaceTempView("v")
    assert(s.sql("SELECT graft_dot(a, b) AS d FROM v").head().getDouble(0) == 32.0)
    val sqlSh = s.sql(
      "SELECT graft_word_shingles('The quick brown fox', 2) AS sh")
      .head().getSeq[String](0)
    assert(sqlSh == Seq("the quick", "quick brown", "brown fox"))
    val sqlSim = s.sql(
      "SELECT graft_simhash64(graft_word_shingles('a b c d', 2)) AS h")
      .head().getLong(0)
    val colSim = df.sparkSession.range(1)
      .select(graft.functions.TextHash.simhash64(
        graft.functions.Shingles.wordShingles(
          org.apache.spark.sql.functions.lit("a b c d"), 2)))
      .head().getLong(0)
    assert(sqlSim == colSim)
    assert(s.sql("SELECT size(graft_winnow('abcdefghijklmnopqrstuvwxyz', 8, 4)) AS n")
      .head().getInt(0) > 0)
    assert(s.sql(
      "SELECT size(graft_hyperplane_bands(array(1.0D, 2.0D), 4, 6, 2)) AS n")
      .head().getInt(0) == 4)
  }

  test("SparkSessionExtensions injector wires the functions at session build") {
    // build a brand-new SparkSession (same SparkContext) through the
    // injector via Builder.withExtensions — the programmatic twin of
    // `spark-submit --conf spark.sql.extensions=graft.GraftExtensions`
    // (the conf form is static, read from the SparkContext at JVM start, so
    // it cannot be exercised inside a shared-context test JVM); active and
    // default sessions are restored afterwards.
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      assert(s ne orig)
      assert(s.sql("SELECT graft_dot(array(2.0D), array(8.0D)) AS d")
        .head().getDouble(0) == 16.0)
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }

  test("spark.sql text over registered views matches the DataFrame query") {
    // the SQL front end is a first-class way in: register the corpus as
    // views and run a full query as SQL text — it must agree row-for-row
    // with the Column-API form the oracle gate checks (q01's shape)
    val s = spark.newSession()
    GraftExtensions.register(s)
    Tables.registerAll(s, sf0001)
    val sqlRows = s.sql(
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(_.toSeq)
    import org.apache.spark.sql.functions._
    val dfRows = Tables.lineitem(s, sf0001)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .collect().map(_.toSeq)
    assert(sqlRows.sameElements(dfRows))
  }

  test("non-literal codegen parameters are rejected with a clear error") {
    val s = spark.newSession()
    GraftExtensions.register(s)
    val e = intercept[Exception] {
      s.sql("SELECT graft_word_shingles('a b', cast(rand() * 3 AS INT))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("BoundLevenshtein rule rewrites threshold predicates and preserves results") {
    val s = spark.newSession()
    GraftExtensions.register(s)
    import s.implicits._
    // parquet-backed fixture: a LocalRelation would be constant-folded by
    // ConvertToLocalRelation before the rewrite is observable in the plan
    val dir = ops.Sources.scratchDir(s, "graft_lev_rule")
    Seq(("kitten", "sitting"), ("flaw", "lawn"), ("abc", "abc"),
      ("aaaaaaaaaa", "bbbbbbbbbb"), ("x", "xy"))
      .toDF("a", "b").write.mode("overwrite").parquet(s"$dir/pairs")
    s.read.parquet(s"$dir/pairs").createOrReplaceTempView("pairs")
    val q = s.sql("SELECT a, b FROM pairs WHERE levenshtein(a, b) <= 3 ORDER BY a")
    // the optimized plan carries the bounded kernel: levenshtein(a, b, 3) >= 0
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("levenshtein(a#") && opt.contains("Some(3)) >= 0"),
      s"unbounded comparator survived optimization:\n$opt")
    assert(q.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("abc", "abc"), ("flaw", "lawn"), ("kitten", "sitting"), ("x", "xy")))
    // strict form rewrites through k-1; mirrored literal-first form too
    val strict = s.sql("SELECT count(*) FROM pairs WHERE levenshtein(a, b) < 3")
    assert(strict.queryExecution.optimizedPlan.toString.contains("Some(2)) >= 0"))
    assert(strict.head().getLong(0) == 3L)
    val mirrored = s.sql("SELECT count(*) FROM pairs WHERE 3 >= levenshtein(a, b)")
    assert(mirrored.queryExecution.optimizedPlan.toString.contains("Some(3)) >= 0"))
    assert(mirrored.head().getLong(0) == 4L)
    // expected sets hand-verified against the true distances (kitten→3,
    // flaw→2, abc→0, aaaa…→10, x→1), so the rewrite's semantics are pinned
    // against an independent reference, not against itself
  }
}
