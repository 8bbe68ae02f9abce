package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Machine-line per-query seconds, BOUNDED at 3 chars: failures (the
    * negated markers) collapse to "-1" (their magnitude is meaningless —
    * the errors map and stderr carry the detail), 1 decimal below 10 s
    * ("0.4"…"9.9"), integer at 10…999 s ("12", "599" — the bench ceiling
    * is 600 s/query, so 999 can't truncate a real value). The bound is
    * what makes BenchContractSpec's line-length estimate a guaranteed
    * worst case — a throttle-inflated run cannot grow entries past it and
    * clip the driver's 2000-char stdout tail (the BENCH_r03/r04 failure
    * mode; tightened 4→3 chars in round 8 when the registry passed 170).
    * stderr keeps 3 decimals. */
  private[graft] def compactSecs(v: Double): String =
    if (v < 0) "-1"
    // branch at 9.95, not 10: "%.1f" of 9.96 already rounds to "10.0"
    // (5 chars) — the decimal form must only ever render x.x
    else if (v >= 9.95) math.min(v.round, 999L).toString
    else "%.1f".formatLocal(java.util.Locale.ROOT, v)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Scale experiments only (SPARK_GRAFT_INIT_PARTITIONS): start AQE
    // from more reduce partitions than cores and let coalescing shrink
    // the small stages — at 10×/30× corpora the fixed cpus-wide shuffle
    // otherwise packs 3× the rows per partition (sort spill + GC, the
    // superlinear term of the pair-stream family). Defaults to `cpus`,
    // so the driver's board config is byte-identical to prior rounds.
    val initParts = sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // compressed parquet bytes understate exploded-text work ~50x: the
      // 4MB default openCostInBytes floors the scan split target and left
      // an 18MB documents file at FIVE splits, so the shingle explode and
      // its eager checkpoint materialized 5-partition RDDs that throttled
      // every downstream map stage to 5-way parallelism on a 32-core box
      // (measured: q27-direct sf3 58s at 5 splits vs 43s on 3.3x MORE
      // data at 15 splits). 256KB lets files.minPartitionNum (defaults to
      // the core count) win; big tables already split past openCost.
      .config("spark.sql.files.openCostInBytes", (256 * 1024).toString)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initParts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // library init: SQL functions + the injected plan rules (incl.
    // honest checkpoint statistics) on this live session
    GraftExtensions.register(spark)
    // payload corpora (100 KB+ rows): bound the vectorized reader's batch
    // before the first scan — footer-only, no-op on narrow corpora
    Tables.tuneVectorBatch(spark, sfDir)
    // Contention tripwire: a bench sharing the box with another heavy JVM
    // measures the weather, not the code (BENCH_r10 was contaminated by a
    // stray 32-thread sf1 run). Warn loudly when the 1-min load average
    // already exceeds half the requested cores at startup.
    try {
      val load1 = scala.io.Source.fromFile("/proc/loadavg").mkString
        .split("\\s+")(0).toDouble
      if (load1 > cpus.toInt / 2.0)
        System.err.println(s"[bench] WARNING: 1-min load average $load1 at startup " +
          s"with local[$cpus] requested — results will reflect CPU contention, not code")
    } catch { case _: Throwable => () }
    // Warm-up (uncounted): first query in a fresh JVM otherwise absorbs
    // one-time costs — noop-sink init, codegen/JIT, parquet footer reads —
    // that belong to the session, not that query. Warm against the BENCH
    // sf dir (not sf0.001): q00 runs first in sorted order and was the
    // only query paying the target dir's footer reads inside its timer.
    ops.Relational.flagship(spark, sfDir).write.mode("overwrite").format("noop").save()
    // Also warm every corpus table end-to-end (full column read, not just
    // footers): the flagship only touches the TPC-H star, so the first
    // documents/events/embeddings query otherwise pays that table's cold
    // page-cache read + decompression inside its own timer (q26 absorbed
    // ~20s of exactly this in two consecutive driver runs). The whole sf0.1
    // corpus is ~17 MB — a one-shot uncounted scan.
    Tables.names.foreach { t =>
      Tables.load(spark, sfDir, t).write.mode("overwrite").format("noop").save()
    }
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
    // And the streaming machinery: the first StreamingQuery in a JVM pays
    // StreamExecution/state-store/memory-sink class loading and the
    // micro-batch planner's first codegen — session costs the first
    // streaming query (q76 in sorted order) otherwise absorbs. One windowed
    // aggregate over the bench dir's events table (2 MB at sf0.1; the dir
    // is the configurable source of truth, never a hardcoded path) replays
    // the whole path uncounted.
    locally {
      import graft.streaming.EventStreams
      EventStreams.runToMemory(spark,
        EventStreams.tumblingDaily(EventStreams.readEvents(spark, sfDir)),
        "bench_stream_warm")
      spark.catalog.clearCache()
    }
    // sorted: deterministic run order, comparable across rounds
    val errors = scala.collection.mutable.ListBuffer.empty[(String, String)]
    def timeOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        recordError: Boolean): Double = {
      // Flushed start marker BEFORE the work: a query that crashes the JVM
      // or hangs past the driver's timeout is attributable from stderr.
      // Round 10's sf1 probe had an unattributable keyed-sum overflow
      // precisely because only the completion line existed.
      System.err.println(s"[bench] start $name")
      System.err.flush()
      val t0 = System.nanoTime()
      // noop sink: forces full evaluation of every output column. A bare
      // count() lets Catalyst prune expensive expressions (a global
      // aggregate's row count needs none of them), under-measuring any
      // query whose hot columns are prunable.
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          if (recordError)
            errors += name -> s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}"
          false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      // isolate queries from each other: drop caches a query left behind
      // (they'd distort later queries' memory profile) — outside the timer,
      // like the driver's own per-query accounting
      spark.catalog.clearCache()
      // Checkpoint blocks (eagerCkpt) are reclaimed by the ContextCleaner
      // only after GC proves the frame unreachable; between back-to-back
      // heavy queries the heap can fill with dead checkpoint RDDs faster
      // than a natural GC cycle notices them (measured: a 19-query
      // text-family sequence at the 12.8M-token long-docs shape killed the
      // context inside its LAST query at -Xmx8g, while the same query
      // passed alone — cumulative retention, not a per-query cost). One
      // explicit GC per query, outside the timer, lets the cleaner run —
      // the same role the driver's fresh-JVM-per-query accounting plays.
      // Opt-in (big-shape scale runs): a full GC per query stalls all 32
      // threads and cold-starts the next query's TLABs/code paths, and the
      // driver's own sf0.1 board never accumulates enough dead checkpoint
      // mass to need it — so the default board stays GC-free.
      if (sys.env.contains("SPARK_GRAFT_GC_PER_QUERY")) System.gc()
      // failed query → negated time: visibly broken in the JSON instead of
      // masquerading as a (suspiciously fast) success. Floor the magnitude
      // so a fast analysis failure can't round to "-0.0" at the 1-decimal
      // output precision and read back as a ~0s success.
      if (ok) secs else -math.max(secs, 0.1)
    }
    // Dev-only subset filter for scale spot-runs (sf3 probes of targeted
    // families): comma-separated name prefixes. The driver never sets it —
    // the full board stays the default; warm-ups run either way so subset
    // numbers stay comparable with full-board entries.
    val only: String => Boolean = sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some(ps) => val pre = ps.split(","); n => pre.exists(n.startsWith)
      case None => _ => true
    }
    val firstPass = SparkEntry.queries.toSeq.filter(kv => only(kv._1))
      .sortBy(_._1).map { case (name, fn) =>
      (name, fn, timeOne(name, fn, recordError = true))
    }
    // Throttle-resilience convention (documented in BenchContractSpec and
    // README): the shared VM stalls whole stretches of a run 2-10× (r3/r6
    // both recorded untouched queries inflating; isolated re-measures showed
    // no code change; r8 re-measured r7's three >1.5× upticks in isolation —
    // q87 3.0-4.0s, q108 2.3s, q109 1.5s cold-RunOne against r7 tails of
    // 2.9/2.0/2.3 on untouched files: same environmental pattern, no code
    // regression), so a single-pass tail entry conflates code cost with
    // VM weather. Queries whose first pass exceeds the threshold get ONE
    // re-run and report the MIN of their successful passes — min is the
    // right estimator for an additive-noise floor, and the second pass also
    // absorbs first-use session costs no warm-up covers (e.g. q127's
    // RocksDB native-library load). Failures are never retried (a real
    // failure fails both ways; see the negated-time convention) and a
    // flaky second pass cannot erase a recorded first-pass success.
    val SecondPassThreshold = 3.0
    val results = firstPass.map { case (name, fn, t1) =>
      if (t1 <= SecondPassThreshold) name -> t1
      else {
        val t2 = timeOne(name, fn, recordError = false)
        name -> (if (t2 > 0) math.min(t1, t2) else t1)
      }
    }
    // Locale.ROOT: the f interpolator uses the JVM default locale, which in
    // comma-decimal locales would print "1,234" and corrupt the JSON.
    def ms(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // bounded 4-char rendering on the machine line (see compactSecs)
    def cs(v: Double): String = compactSecs(v)
    // headline total = successful queries only; failures stay visible as
    // negated per-query entries + n_errors (a broken bench must never look
    // faster than a working one)
    val total = results.map(_._2).filter(_ > 0).sum
    def esc(v: String): String = v.flatMap {
      // escape control chars too — Spark exception messages are multi-line
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    // Full-fidelity per-query report → stderr (for humans and logs; sbt
    // keeps stderr separate so it can't interleave with the machine line).
    results.foreach { case (k, v) => System.err.println(s"[bench] $k ${ms(v)}s") }
    errors.foreach { case (k, v) => System.err.println(s"[bench] ERROR $k: $v") }
    // Machine-readable line → stdout, COMPACT ON PURPOSE: the driver
    // retains only the last ~2000 chars of stdout and parses the JSON out
    // of that tail. The old line spelled out 110 full query names at 9
    // decimals (~4 KB) — its head fell off the tail and the driver recorded
    // parsed:null two rounds running (BENCH_r03/r04). Short keys (the
    // unique qNN prefix), 1-decimal seconds (since 137 queries; stderr
    // keeps 3 decimals) and an errors map only when non-empty keep the
    // line ~1.6 KB, leaving headroom under the 2000-char window after
    // sbt's trailing "[success]" banner.
    // Sorted Seq order is preserved (toMap would hash-scramble it).
    // Keys are the BARE query numbers since round 7 (the "q" prefix cost
    // ~150 chars at 147 queries and the line was ~6 chars from the
    // BenchContractSpec ceiling); stderr keeps full names.
    // leading zeros stripped too ("q00" → "0") since round 8 — SparkEntry
    // guards NUMERIC prefix uniqueness so distinct queries can't collide
    def key(name: String): String =
      name.takeWhile(_ != '_').stripPrefix("q").toInt.toString
    // The per-query map carries the SLOWEST ≤150 entries only (since late
    // round 8, when the registry outgrew the all-entries worst case): the
    // omitted fast tail is summarized by n_omitted/omitted_total so the
    // accounting still closes, and stderr keeps every query at 3
    // decimals. This bounds the line for ANY registry size — a
    // throttle-inflated run can slow queries down but cannot add entries.
    val MaxEntries = 150
    val shown: Set[String] =
      if (results.size <= MaxEntries) results.map(_._1).toSet
      else results.sortBy(-_._2).take(MaxEntries).map(_._1).toSet
    val omitted = results.filterNot(r => shown(r._1))
    val qs = results.filter(r => shown(r._1)).map { case (k, v) =>
      "\"" + key(k) + "\":" + cs(v)
    }.mkString("{", ",", "}")
    val omitJson =
      if (omitted.isEmpty) ""
      else s""","n_omitted":${omitted.size},"omitted_total":${cs(
        omitted.map(_._2).filter(_ > 0).sum)}"""
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) =>
        "\"" + key(k) + "\":\"" + esc(v.take(60)) + "\""
      }.mkString(""","errors":{""", ",", "}")
    // sf as a bare number ONLY when it is one (a digit/dot scan would let
    // "01" or "0.1.2" through and corrupt the whole line) — else the quoted
    // path
    val sf = sfDir.split("/").last.stripPrefix("sf") match {
      case s if s.matches("(0|[1-9][0-9]*)(\\.[0-9]+)?") => s
      case _ => "\"" + esc(sfDir) + "\""
    }
    val line = s"""{"metric":"total","value":${ms(total)},"unit":"sec","sf":$sf,"n_queries":${results.size},"n_errors":${errors.size}$errJson$omitJson,"queries":$qs}"""
    if (line.length > 1800)
      System.err.println(s"[bench] WARNING: JSON line ${line.length} chars — nearing the driver's 2000-char stdout tail")
    println(line)
    spark.stop()
  }
}
