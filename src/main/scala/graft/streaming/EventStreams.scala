package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.LongType

/** Structured Streaming over the events table (SURVEY.md §2.9): the same
  * window()/session_window() expressions the batch queries q23–q25 verify
  * against DuckDB, run under readStream with watermarks. Batch/stream parity
  * is asserted in unit tests (same expressions, same results on a static
  * replay) — the pattern Spark's docs recommend for streaming correctness.
  *
  * Scale notes: each aggregation keeps per-(window,key) state bounded by the
  * watermark horizon; at cluster scale state is HDFS/RocksDB-checkpointed
  * and partitioned by the grouping key — nothing here is driver-resident.
  */
object EventStreams {

  /** The events stream, replayed from the batch parquet. ts has arrived as
    * INT64 nanos in some corpus generations and plain TIMESTAMP(MICROS) in
    * others (see Tables.load); both normalize to µs here. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // Watermarks require TIMESTAMP (with zone), not TIMESTAMP_NTZ — with a
    // UTC session the wall-clock values are identical to the batch NTZ form;
    // each aggregate casts window bounds back to NTZ for batch parity.
    // The file-stream source wants a directory: stream the table dir with a
    // glob picking just the events file.
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Tumbling 1-day aggregate with a 1-hour watermark (≡ batch q23). */
  def tumblingDaily(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").cast("timestamp_ntz").as("day_start"),
        col("n_events"), col("total_value"))

  /** Sliding 1-day/6-hour aggregate (≡ batch q24). */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day", "6 hours"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").cast("timestamp_ntz").as("win_start"),
        col("n_events"), col("total_value"))

  /** Per-user session windows, 30-minute gap (≡ batch q25). */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("n_events"), col("total_value"))

  /** Stream-stream inner join with event-time bounds: each purchase joins
    * the views of the SAME user in the preceding hour (view→purchase
    * attribution). The time-range predicate is what makes this viable as a
    * stream-stream join — with both sides watermarked, Spark derives a
    * state-eviction bound from `p_ts ∈ (v_ts, v_ts + 1h]` and drops buffered
    * rows once the other side's watermark passes their join horizon, so
    * join state is bounded at any input size (an unconstrained
    * stream-stream join would buffer both streams forever). Same def serves
    * the batch side (watermarks only attach to streaming frames), so the
    * parity baseline cannot drift from the streamed plan. */
  def attribution(views: DataFrame, purchases: DataFrame): DataFrame = {
    def wm(df: DataFrame, tsCol: String): DataFrame =
      if (df.isStreaming) df.withWatermark(tsCol, "1 hour") else df
    val v = wm(views.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts")), "v_ts")
    val p = wm(purchases.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value")), "p_ts")
    v.join(p, col("v_user") === col("p_user") &&
      col("p_ts") > col("v_ts") &&
      col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
  }

  /** Run a streaming DataFrame to completion against the static input via a
    * memory sink; returns the collected result table.
    *
    * `shufflePartitions`: stateful-operator width for THIS query. A
    * micro-batch pays fixed machinery per state partition (store init +
    * snapshot/delta checkpoint files per partition per batch — a
    * stream-stream join holds FOUR stores per partition), so a bounded
    * replay at session width (32) spends more on state plumbing than on
    * rows. The conf is read at query START and baked into the checkpoint,
    * so setting it around `start()` pins the width for the query's whole
    * life; the session value is restored immediately after. At production
    * scale the same lever applies in reverse — size state partitions to
    * the key cardinality, not the session default. */
  /** Recursively delete a scratch subtree if it exists (the wipe step the
    * file-replay streaming queries all need for per-session idempotence). */
  def wipe(path: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(path)) {
      import scala.jdk.CollectionConverters._
      Files.walk(path).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
  }

  /** Land `df` as exactly ONE parquet data file under `dir`, and verify
    * the count. The replay contract every [[fileReplay]] consumer relies
    * on is "one landed batch = one file = one micro-batch under
    * maxFilesPerTrigger=1, in landing order": a multi-part write breaks it
    * SILENTLY at larger inputs — the part files share one mtime yet each
    * spans the batch's full time range, so under maxFilesPerTrigger=1 the
    * first file advances the watermark past its siblings' oldest rows and
    * those rows are dropped as late (q286's thirds were green only because
    * the test corpora happened to produce single-partition writes). The
    * coalesce is a narrow merge on a bounded replay slice — never the
    * production write path. */
  private def landSingle(df: DataFrame, dir: String): Unit = {
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    import scala.jdk.CollectionConverters._
    // Files.list holds the directory fd until the stream is closed —
    // multi-landing replays in a long-lived JVM would leak one per batch
    val parts = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(dir))) { st =>
      st.iterator().asScala.count(_.toString.endsWith(".parquet"))
    }
    require(parts == 1,
      s"file-replay landing at $dir produced $parts parquet part files; " +
        "the one-file-per-batch replay contract (watermark ordering under " +
        "maxFilesPerTrigger=1) needs exactly 1")
  }

  /** The write→stream-back file-replay harness shared by the streaming
    * queries that need REAL file-source semantics (q197's checkpoint
    * recovery, q213's late file, q267's sentinel flushes, q286's thirds):
    * wipes `root/input`, lands `df` as the feed's first parquet file
    * (exactly one data file — see [[landSingle]]), and returns
    * (inputDir, stream) where the stream globs every subdir of
    * inputDir so later files ([[landFile]]) become later micro-batches.
    * The stream
    * carries `df`'s schema verbatim; callers add ts casts/watermarks. */
  def fileReplay(spark: SparkSession, df: DataFrame,
      root: java.nio.file.Path,
      options: Map[String, String] = Map.empty): (String, DataFrame) = {
    val inDir = root.resolve("input")
    wipe(inDir)
    landSingle(df, s"$inDir/f1")
    val stream = spark.readStream.schema(df.schema)
      .option("pathGlobFilter", "*.parquet").options(options)
      .parquet(s"$inDir/*")
    (inDir.toString, stream)
  }

  /** Land one more file into a [[fileReplay]] feed (a late batch, a
    * watermark sentinel): the glob picks it up on the next trigger.
    * Exactly one data file per landing ([[landSingle]]). */
  def landFile(df: DataFrame, inDir: String, name: String): Unit =
    landSingle(df, s"$inDir/$name")

  /** Drive a ROW-LEVEL streaming frame to completion while keeping the
    * driver O(1) at ANY scale factor: each micro-batch is reduced
    * EXECUTOR-side to one row of batch-additive BIGINT aggregates
    * (counts / exact-cent sums / order-independent sum-of-hash
    * checksums — NOT countDistinct, which does not compose across
    * batches), and only that one row's values fold into a driver array.
    * This replaces the row-level memory sink the parity harnesses used
    * before round 9 — the sink there held the full joined/deduped row
    * stream driver-resident, a bottleneck at 100× SF even though every
    * operator around it was distributed. Returns the per-aggregate
    * totals in input order (null partial aggregates — e.g. sum over an
    * empty batch — fold as 0).
    *
    * `feed` runs on the caller thread after start() and must drain the
    * source (default: one processAllAvailable; q267 overrides it with
    * its sentinel-flush dance). `shufflePartitions` follows
    * [[runToMemory]]'s state-width note.
    */
  /** Scope BOTH stream-width confs to a streaming run: the stateful
    * width (`shuffle.partitions`) AND the scan-split floor
    * (`files.minPartitionNum`, which defaults to the session's core count
    * — so every micro-batch's file scan otherwise fans a few-MB replay
    * file into 32 tiny tasks, pure launch overhead repeated per batch;
    * the round-17 8-core board beating the 32-core board on exactly the
    * streaming queries was this machinery, guide §2 right-size
    * partitions). Both confs are captured by the stream's cloned session
    * at query START, so set-around-start pins them for the query's life;
    * session values restore after. At production replay scale the same
    * lever sizes splits to the landed batch, not the cluster width. */
  def withStreamWidth[T](spark: SparkSession,
      width: Option[Int])(body: => T): T = {
    val keys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.files.minPartitionNum")
    width match {
      case None => body
      case Some(n) =>
        val prev = keys.map(k => k -> spark.conf.getOption(k))
        keys.foreach(k => spark.conf.set(k, n.toString))
        try body
        finally prev.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
    }
  }

  def runFolded(spark: SparkSession, rows: DataFrame, aggs: Seq[Column],
      shufflePartitions: Option[Int] = None,
      feed: StreamingQuery => Unit = _.processAllAvailable(),
      // cross-batch combiner per aggregate (default: +). A bit_xor
      // aggregate must fold with ^ across micro-batches — XOR's identity
      // is also 0, so the zero-initialised totals work for both.
      combine: Seq[(Long, Long) => Long] = Nil): Seq[Long] = {
    require(aggs.nonEmpty)
    require(combine.isEmpty || combine.size == aggs.size,
      s"combine (${combine.size}) must match aggs (${aggs.size}) when given")
    val comb: Array[(Long, Long) => Long] =
      if (combine.isEmpty) Array.fill(aggs.size)(_ + _) else combine.toArray
    val totals = Array.fill(aggs.size)(0L)
    withStreamWidth(spark, shufflePartitions) {
      val q: StreamingQuery = rows.writeStream.outputMode("append")
        .foreachBatch { (bdf: org.apache.spark.sql.Dataset[Row], _: Long) =>
          val reduced = bdf.agg(aggs.head, aggs.tail: _*)
          // the O(1) contract, asserted: the sink-side frame is ONE row
          // of BIGINT aggregates, never event rows
          require(reduced.schema.fields.forall(_.dataType == LongType),
            s"runFolded aggregates must all be BIGINT (batch-additive); " +
              s"got ${reduced.schema.simpleString}")
          val r = reduced.head()
          var i = 0
          while (i < totals.length) {
            if (!r.isNullAt(i)) totals(i) = comb(i)(totals(i), r.getLong(i))
            i += 1
          }
        }
        .start()
      try feed(q) finally q.stop()
    }
    totals.toSeq
  }

  def runToMemory(spark: SparkSession, agg: DataFrame, name: String,
      outputMode: String = "complete",
      shufflePartitions: Option[Int] = None): DataFrame = {
    // width confs restore only after the run completes: they are captured
    // when the stream's session is CLONED at query start, which races a
    // restore placed right after start() — see withStreamWidth
    withStreamWidth(spark, shufflePartitions) {
      val q: StreamingQuery = agg.writeStream
        .outputMode(outputMode)
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
  }
}
