package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (round 18, guide §1): phase-level timing of the MLlib
  * quartet — q40 (RF), q154 (GBT), q234 (AFT), q152 (persistence) — plus
  * q128's three DAG stages. The bench board says the family costs ~42 s of
  * the 437 s sf0.1 total and dominates sf1; this probe answers WHERE inside
  * each query the wall clock goes (featurize vs fit vs score vs IO) so the
  * optimization targets the real term, not the guessable one.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ProbeMl /root/testdata/sf0.1"
  */
object ProbeMl {

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.openCostInBytes", (256 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(s)
    Tables.tuneVectorBatch(s, d)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe-ml] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // warm-up mirroring Bench: session costs out of the phase numbers
    ops.Relational.flagship(s, d).write.mode("overwrite").format("noop").save()
    locally {
      val tiny = s.range(64).select(
        col("id").cast("double").as("y"),
        (col("id") % 3).cast("string").as("c"),
        rand(7).as("x1"), rand(11).as("x2"))
      graft.pipeline.Model.fitPredict(tiny, "y", Seq("c", "x1", "x2"),
        numTrees = 2, maxDepth = 2)._2.unpersist(blocking = false)
      s.catalog.clearCache()
    }

    val which = if (args.length > 1) args(1).split(",").toSet
                else Set("q40", "q154", "q234", "q152", "q128")

    // `real:` prefix — time the REGISTERED query fns (bench methodology:
    // noop sink, clearCache between, two passes, min reported) instead of
    // the inline phase copies below. The inline sections freeze the
    // round-17 shapes for phase attribution; this mode measures what the
    // board measures.
    which.find(_.startsWith("real:")).foreach { spec =>
      val prefixes = spec.stripPrefix("real:").split("\\+")
      val names = SparkEntry.queries.keys.toSeq.sorted
        .filter(n => prefixes.exists(n.startsWith))
      names.foreach { name =>
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(s, d)
            .write.mode("overwrite").format("noop").save()
          val sec = (System.nanoTime() - t0) / 1e9
          s.catalog.clearCache()
          sec
        }
        System.err.println(f"[probe-ml] real $name%-26s min ${ts.min}%6.2fs  (${ts.map(t => f"$t%.2f").mkString(", ")})")
      }
      s.stop()
      return
    }

    if (which("q40")) {
      val feats = Seq("l_quantity", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus")
      val li = Tables.lineitem(s, d)
        .select((feats :+ "l_extendedprice").map(col): _*).cache()
      timed("q40 cache-materialize")(li.count())
      val Array(train, valid) = li.randomSplit(Array(0.8, 0.2), 42L)
      val rf = new org.apache.spark.ml.regression.RandomForestRegressor()
        .setNumTrees(8).setMaxDepth(5).setMaxBins(16)
        .setSubsamplingRate(0.5).setSeed(42L)
      rf.setLabelCol("l_extendedprice").setFeaturesCol("features")
      val featPipe = new org.apache.spark.ml.Pipeline().setStages(
        Array(new org.apache.spark.ml.feature.StringIndexer()
          .setInputCols(Array("l_returnflag", "l_linestatus"))
          .setOutputCols(Array("l_returnflag_idx", "l_linestatus_idx"))
          .setHandleInvalid("keep"),
          new org.apache.spark.ml.feature.VectorAssembler()
            .setInputCols(Array("l_quantity", "l_discount", "l_tax",
              "l_returnflag_idx", "l_linestatus_idx"))
            .setOutputCol("features")))
      val featModel = timed("q40 indexer-fit")(featPipe.fit(train))
      val fitParts = math.max(2, s.sparkContext.defaultParallelism / 4)
      val trainFeat = featModel.transform(train)
        .select(col("l_extendedprice"), col("features"))
        .coalesce(fitParts).cache()
      timed("q40 featurize-materialize")(trainFeat.count())
      val model = timed("q40 rf-fit")(rf.fit(trainFeat))
      trainFeat.unpersist(blocking = false)
      val scored = (featModel.stages.toSeq :+ model)
        .foldLeft(valid)((df, t) => t.transform(df)).cache()
      timed("q40 score-metrics")(scored.agg(
        count(lit(1)), sum(pow(col("l_extendedprice") - col("prediction"), 2)),
        sum(pow(col("l_extendedprice"), 2)), sum(col("l_extendedprice"))).head())
      timed("q40 scored-count")(scored.count())
      scored.unpersist(blocking = false)
      timed("q40 final-agg")(li.agg(count(lit(1)),
        stddev(col("l_extendedprice"))).head())
      li.unpersist(blocking = false)
      s.catalog.clearCache()
    }

    if (which("q154")) {
      val feats = Seq("l_quantity", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus")
      val li = Tables.lineitem(s, d)
        .select((feats :+ "l_extendedprice").map(col): _*).cache()
      timed("q154 cache-materialize")(li.count())
      val Array(train, valid) = li.randomSplit(Array(0.8, 0.2), 42L)
      val gbt = new org.apache.spark.ml.regression.GBTRegressor()
        .setMaxIter(4).setMaxDepth(3).setStepSize(0.1)
        .setMaxBins(8).setSubsamplingRate(0.5).setSeed(42L)
      gbt.setLabelCol("l_extendedprice").setFeaturesCol("features")
      val featPipe = new org.apache.spark.ml.Pipeline().setStages(
        Array(new org.apache.spark.ml.feature.StringIndexer()
          .setInputCols(Array("l_returnflag", "l_linestatus"))
          .setOutputCols(Array("l_returnflag_idx", "l_linestatus_idx"))
          .setHandleInvalid("keep"),
          new org.apache.spark.ml.feature.VectorAssembler()
            .setInputCols(Array("l_quantity", "l_discount", "l_tax",
              "l_returnflag_idx", "l_linestatus_idx"))
            .setOutputCol("features")))
      val featModel = timed("q154 indexer-fit")(featPipe.fit(train))
      val fitParts = math.max(2, s.sparkContext.defaultParallelism / 4)
      val trainFeat = featModel.transform(train)
        .select(col("l_extendedprice"), col("features"))
        .coalesce(fitParts).cache()
      timed("q154 featurize-materialize")(trainFeat.count())
      val model = timed("q154 gbt-fit")(gbt.fit(trainFeat))
      trainFeat.unpersist(blocking = false)
      val scored = (featModel.stages.toSeq :+ model)
        .foldLeft(valid)((df, t) => t.transform(df)).cache()
      timed("q154 score-metrics")(scored.agg(
        count(lit(1)), sum(pow(col("l_extendedprice") - col("prediction"), 2)),
        sum(pow(col("l_extendedprice"), 2)), sum(col("l_extendedprice"))).head())
      timed("q154 scored-count")(scored.count())
      scored.unpersist(blocking = false)
      li.unpersist(blocking = false)
      s.catalog.clearCache()
    }

    if (which("q234")) {
      import org.apache.spark.ml.feature.VectorAssembler
      import org.apache.spark.ml.regression.AFTSurvivalRegression
      val od = col("o_orderdate").cast("date")
      val mx = Tables.orders(s, d).agg(max(od).as("mxd"))
      val subj = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(datediff(max(od), min(od)).cast("double").as("label"),
          max(od).as("last"), count(lit(1)).cast("double").as("n_orders"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("spend"))
        .join(broadcast(mx), lit(true))
        .filter(col("label") > 0)
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_acctbal")),
          col("o_custkey") === col("c_custkey"))
        .select(col("label"),
          when(col("last") < date_sub(col("mxd"), 180), 1.0).otherwise(0.0)
            .as("censor"),
          col("n_orders"), log1p(col("spend").cast("double")).as("lspend"),
          (col("c_acctbal") / 1000.0).as("bal_k"))
      val assembled = new VectorAssembler()
        .setInputCols(Array("n_orders", "lspend", "bal_k"))
        .setOutputCol("features")
        .transform(subj)
        .cache()
      timed("q234 assemble-materialize")(assembled.count())
      val model = timed("q234 aft-fit-25iter")(
        new AFTSurvivalRegression()
          .setCensorCol("censor")
          .setQuantileProbabilities(Array(0.25, 0.5, 0.75))
          .setQuantilesCol("q")
          .setMaxIter(25)
          .fit(assembled))
      timed("q234 score-agg")(model.transform(assembled)
        .select(col("censor"), col("prediction"),
          element_at(org.apache.spark.ml.functions
            .vector_to_array(col("q")), 1).as("q25"),
          element_at(org.apache.spark.ml.functions
            .vector_to_array(col("q")), 2).as("q50"),
          element_at(org.apache.spark.ml.functions
            .vector_to_array(col("q")), 3).as("q75"))
        .agg(count(lit(1)), sum(col("censor")), min(col("prediction")),
          max(when(col("q25") > col("q50") || col("q50") > col("q75"), 1)
            .otherwise(0))).head())
      assembled.unpersist(blocking = false)
      s.catalog.clearCache()
    }

    if (which("q152")) {
      // standalone path (no memo): fit on 20% sample + save/load/2 digests
      val feats = Seq("l_quantity", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus")
      val li = Tables.lineitem(s, d)
        .select((Seq("l_orderkey", "l_linenumber", "l_extendedprice") ++ feats)
          .map(col): _*).cache()
      timed("q152 cache-materialize")(li.count())
      val fitDf = li.sample(withReplacement = false, 0.2, 42L)
      val rf = new org.apache.spark.ml.regression.RandomForestRegressor()
        .setNumTrees(8).setMaxDepth(5).setMaxBins(16)
        .setSubsamplingRate(0.5).setSeed(42L)
      val transformers = timed("q152 fit-20pct")(
        graft.pipeline.Model.fitTransformers(
          fitDf, "l_extendedprice", feats, rf))
      val model = timed("q152 wrap-pipeline")(
        new org.apache.spark.ml.Pipeline()
          .setStages(transformers.toArray).fit(fitDf))
      val dir = java.nio.file.Files.createTempDirectory("graft_probe152")
      timed("q152 save")(model.write.overwrite().save(dir.toString))
      val reloaded = timed("q152 load")(
        org.apache.spark.ml.PipelineModel.load(dir.toString))
      def digest(m: org.apache.spark.ml.PipelineModel) = m.transform(li)
        .select(xxhash64(struct(
          (Seq("l_orderkey", "l_linenumber") ++ feats :+ "prediction")
            .map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)").as("digest"), count(lit(1)).as("n"))
        .head()
      timed("q152 digest-1")(digest(model))
      timed("q152 digest-2")(digest(reloaded))
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
      li.unpersist(blocking = false)
      s.catalog.clearCache()
    }

    if (which("q128")) {
      val raw = ops.Sources.scratchDir(s, "graft_probe_dag_raw")
      val out = ops.Sources.scratchDir(s, "graft_probe_dag_out")
      // regenerate the fixture via the query itself is private; re-run the
      // DAG stages against q128's own scratch fixture by invoking the query
      // once (timed end to end), then its stages separately
      val key = "spark.sql.shuffle.partitions"
      val prev = s.conf.get(key)
      try {
        s.conf.set(key, "4")
        // fixture: 6 stores × 3 depts × 10 weeks — write it here inline
        java.nio.file.Files.createDirectories(raw)
        def date(w: Int): String =
          java.time.LocalDate.of(2010, 2, 5).plusWeeks(w.toLong).toString
        def sales(st: Int, dp: Int, w: Int): Double =
          1000.0 + st * 37 + dp * 11 + w * 5 + (if (w == 2) 400 else 0)
        def put(name: String, content: String): Unit =
          java.nio.file.Files.write(raw.resolve(name),
            content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val train = new StringBuilder("Store,Dept,Date,Weekly_Sales,IsHoliday\n")
        for (st <- 1 to 6; dp <- 1 to 3; w <- 0 until 10)
          train.append(s"$st,$dp,${date(w)},${sales(st, dp, w)},${w == 2}\n")
        put("train.csv", train.toString)
        val test = new StringBuilder("Store,Dept,Date,IsHoliday\n")
        for (st <- 1 to 6; dp <- 1 to 3; w <- 10 until 12)
          test.append(s"$st,$dp,${date(w)},false\n")
        put("test.csv", test.toString)
        put("stores.csv", ("Store,Type,Size" +: (1 to 6).map(st =>
          s"$st,${"ABC"((st - 1) % 3)},${100000 + st * 1731}")).mkString("\r"))
        val feat = new StringBuilder(
          "Store,Date,Temperature,Fuel_Price,MarkDown1,MarkDown2,MarkDown3," +
            "MarkDown4,MarkDown5,CPI,Unemployment,IsHoliday\n")
        for (st <- 1 to 6; w <- 0 until 12) {
          val md1 = if (w < 5) "NA" else "100.5"
          feat.append(s"$st,${date(w)},${30.0 + 2 * w},${2.5 + w * 0.25}," +
            s"$md1,NA,NA,NA,NA,${200.0 + w},${8.0 - w * 0.125},${w == 2}\n")
        }
        put("features.csv", feat.toString)
        timed("q128 runEtl")(
          graft.pipeline.Walmart.runEtl(s, raw.toString, out.toString))
        timed("q128 runEda")(
          graft.pipeline.Walmart.runEda(s, out.toString))
        timed("q128 runModel")(
          graft.pipeline.Walmart.runModel(s, out.toString))
      } finally s.conf.set(key, prev)
      s.catalog.clearCache()
    }

    s.stop()
  }
}
