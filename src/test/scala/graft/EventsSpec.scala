package graft

import org.apache.spark.sql.functions._

/** Event-time window semantics on literal fixtures + batch/stream parity
  * for the Structured Streaming forms (SURVEY.md §2.9). */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("session_window: 30-min gap starts a new session at >= gap") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:29:59"), 2.0), // same session (< 30 min gap)
      (1L, ts("2024-01-01 10:59:59"), 3.0), // still same (gap from prev < 30)
      (1L, ts("2024-01-01 11:30:00"), 4.0), // exactly 30:01 after -> new
      (2L, ts("2024-01-01 10:00:00"), 5.0))
      .toDF("user_id", "ts", "value")
    val out = df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select(col("user_id"), col("session_window.start").as("start"), col("n"), col("v"))
      .orderBy("user_id", "start").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n") == 3 && out(0).getAs[Double]("v") == 6.0)
    assert(out(1).getAs[Long]("n") == 1 && out(1).getAs[Double]("v") == 4.0)
    assert(out(2).getAs[Long]("n") == 1)
  }

  test("tumbling/sliding window(): epoch-aligned starts, 4 slides per day window") {
    val df = Seq((ts("2024-03-05 13:07:00"), 1.0)).toDF("ts", "value")
    val tumb = df.groupBy(window(col("ts"), "1 day")).count()
      .select(col("window.start")).head().getTimestamp(0)
    assert(tumb == ts("2024-03-05 00:00:00"))
    val slides = df.groupBy(window(col("ts"), "1 day", "6 hours")).count()
      .select(col("window.start")).collect().map(_.getTimestamp(0)).sortBy(_.getTime)
    assert(slides.length == 4)
    assert(slides.head == ts("2024-03-04 18:00:00"))
    assert(slides.last == ts("2024-03-05 12:00:00"))
  }

  test("streaming tumbling-daily equals the batch q23 aggregation") {
    val batch = SparkEntry.queries("q23_tumbling_window")(spark, sf0001)
      .select("day_start", "n_events", "total_value")
      .collect().map(_.toSeq).toSet
    val stream = graft.streaming.EventStreams.runToMemory(spark,
      graft.streaming.EventStreams.tumblingDaily(
        graft.streaming.EventStreams.readEvents(spark, sf0001)),
      "t_tumbling_parity")
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
  }

  test("q83 compaction: max_by(ts, event_id) picks the newest version, ties by id") {
    val df = Seq(
      // user 1, type a: later ts wins regardless of id order
      (10L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0),
      (3L, ts("2024-01-01 12:00:00"), 1L, "a", 2.0),
      // user 1, type b: equal ts -> higher event_id wins
      (20L, ts("2024-01-01 10:00:00"), 1L, "b", 3.0),
      (21L, ts("2024-01-01 10:00:00"), 1L, "b", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // drive the PRODUCTION aggregate (the exact code q83 registers)
    val out = graft.ops.Events.latestByKey(df).orderBy("event_type").collect()
    assert(out(0).getAs[Long]("last_event_id") == 3L &&
      out(0).getAs[Double]("last_value") == 2.0 &&
      out(0).getAs[Long]("n_versions") == 2)
    assert(out(1).getAs[Long]("last_event_id") == 21L &&
      out(1).getAs[Double]("last_value") == 4.0)
  }

  test("q86 funnel: stages must occur strictly in order, per user") {
    def ev(id: Long, u: Long, t: String, tp: String) = (id, u, ts(t), tp)
    val df = Seq(
      // u1: complete ordered funnel
      ev(1, 1, "2024-01-01 09:00:00", "signup"),
      ev(2, 1, "2024-01-01 10:00:00", "view"),
      ev(3, 1, "2024-01-01 11:00:00", "click"),
      ev(4, 1, "2024-01-01 12:00:00", "purchase"),
      // u2: purchase BEFORE click -> funnel stops at click stage
      ev(5, 2, "2024-01-01 09:00:00", "signup"),
      ev(6, 2, "2024-01-01 10:00:00", "view"),
      ev(7, 2, "2024-01-01 10:30:00", "purchase"),
      ev(8, 2, "2024-01-01 11:00:00", "click"),
      // u3: view precedes the signup -> stops after signup
      ev(9, 3, "2024-01-01 08:00:00", "view"),
      ev(10, 3, "2024-01-01 09:00:00", "signup"),
      // u4: no signup at all
      ev(11, 4, "2024-01-01 09:00:00", "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    // drive the PRODUCTION stage pipeline (the exact code q86 registers)
    val staged = graft.ops.Events.funnelFlags(df)
      .agg(sum("sig").as("n_signup"), sum("vw").as("n_view"),
        sum("ck").as("n_click"), sum("by").as("n_purchase"))
      .head()
    assert(staged.getAs[Long]("n_signup") == 3) // u1, u2, u3
    assert(staged.getAs[Long]("n_view") == 2)   // u1, u2 (u3's view too early)
    assert(staged.getAs[Long]("n_click") == 2)  // u1, u2
    assert(staged.getAs[Long]("n_purchase") == 1) // u1 only (u2 out of order)
  }

  test("q93 retention cohorts: week offset from each user's own first day") {
    val df = Seq(
      (1L, ts("2024-01-01 09:00:00")), // u1 cohort 2024-01-01
      (1L, ts("2024-01-04 09:00:00")), // day 3  -> week 0
      (1L, ts("2024-01-09 09:00:00")), // day 8  -> week 1
      (2L, ts("2024-01-02 09:00:00")), // u2 cohort 2024-01-02
      (2L, ts("2024-01-17 09:00:00"))) // day 15 -> week 2
      .toDF("user_id", "ts")
    val got = graft.ops.Events.retentionCohorts(df)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2024-01-01", 0, 1L), ("2024-01-01", 1, 1L),
      ("2024-01-02", 0, 1L), ("2024-01-02", 2, 1L)))
  }

  test("q94 transitions: per-user adjacency, ts ties broken by event_id") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 10:05:00"), "b"),
      (3L, 1L, ts("2024-01-01 10:06:00"), "a"),
      // u2: same ts -> event_id orders x before y
      (4L, 2L, ts("2024-01-01 11:00:00"), "x"),
      (5L, 2L, ts("2024-01-01 11:00:00"), "y"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.ops.Events.transitionMatrix(df)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("a", "b", 1L), ("b", "a", 1L), ("x", "y", 1L)))
  }

  test("streaming sessions equal the batch q25 aggregation") {
    val batch = SparkEntry.queries("q25_session_window")(spark, sf0001)
      .select("user_id", "session_start", "n_events", "total_value")
      .collect().map(_.toSeq).toSet
    val stream = graft.streaming.EventStreams.runToMemory(spark,
      graft.streaming.EventStreams.sessions(
        graft.streaming.EventStreams.readEvents(spark, sf0001)),
      "t_session_parity")
      .select("user_id", "session_start", "n_events", "total_value")
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
  }

  test("stream-stream attribution join equals the batch range join row for row") {
    import graft.streaming.EventStreams
    val cols = Seq("v_user", "v_ts", "p_ts", "p_value")
    val stream = EventStreams.runToMemory(spark,
      EventStreams.attribution(
        EventStreams.readEvents(spark, sf0001),
        EventStreams.readEvents(spark, sf0001)),
      "t_attr_parity", outputMode = "append")
      // stream ts is LTZ (watermark requirement), batch is NTZ — compare
      // wall-clock forms under the UTC session
      .select(col("v_user"), col("v_ts").cast("timestamp_ntz").as("v_ts"),
        col("p_ts").cast("timestamp_ntz").as("p_ts"), col("p_value"))
      .collect().map(_.toSeq).toSet
    val batch = EventStreams.attribution(
      Tables.events(spark, sf0001), Tables.events(spark, sf0001))
      .select(cols.map(col): _*)
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
    assert(batch.nonEmpty, "attribution fixture produced no joined pairs")
    // no BNLJ on the batch side: the range predicate must ride the user
    // equi key
    val p = EventStreams.attribution(
      Tables.events(spark, sf0001), Tables.events(spark, sf0001))
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"attribution degenerated to a nested-loop join:\n$p")
  }

  test("q110 SCD2 intervals: contiguous versions, seamless validity, one current row") {
    val rows = SparkEntry.queries("q110_scd2")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        // events.ts is timestamp_ntz → LocalDateTime in collected rows
        r.getAs[java.time.LocalDateTime](3),
        Option(r.getAs[java.time.LocalDateTime](4)), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, vs) =>
      val sorted = vs.sortBy(_._2)
      // versions are 1..n with no gaps
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"user $user: version numbers not contiguous")
      // each interval closes exactly where the next opens (no gap/overlap),
      // and only the last is open-ended/current
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $user: interval gap at ver ${a._2}")
          assert(!a._6, s"user $user: non-final version flagged current")
        case _ =>
      }
      assert(sorted.last._5.isEmpty && sorted.last._6,
        s"user $user: final version must be open-ended and current")
      // consecutive versions must actually change the attribute (runs are
      // maximal — two adjacent versions with the same value would mean the
      // collapse under-merged)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 != b._3, s"user $user: adjacent versions share value ${a._3}")
        case _ =>
      }
    }
  }

  test("q163 ab test: Welch t replays exactly from driver-side moment sums") {
    val r = SparkEntry.queries("q163_ab_test")(spark, sf0001).head()
    val cents = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).cast("int").as("v"),
        round(col("value") * 100, 0).cast("long").as("c"))
      .collect().map(x => (x.getInt(0), x.getLong(1)))
    def moments(v: Int) = {
      val xs = cents.filter(_._1 == v).map(_._2)
      (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
    }
    val (na, sa, qa) = moments(0); val (nb, sb, qb) = moments(1)
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(r.getAs[Long]("sum_a_cents") == sa)
    assert(r.getAs[Long]("sum_b_cents") == sb)
    def variance(n: Long, s: Long, q: Long) =
      (q.toDouble - (s.toDouble * s) / n) / (n - 1)
    val diff = sb.toDouble / nb - sa.toDouble / na
    val t = diff / math.sqrt(
      variance(na, sa, qa) / na + variance(nb, sb, qb) / nb)
    assert(math.abs(r.getAs[Double]("mean_diff_cents") - diff) < 1e-6)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-6)
  }

  test("stream enrich: streamed join+aggregate equals the batch plan to the cent") {
    val streamed = ops.Events.queries.find(_.name == "q180_stream_enrich").get
      .fn(spark, sf0001).collect()
      .map(r => r.getAs[String]("segment") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("rev_cents"))).toMap
    val batch = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .join(Tables.customer(spark, sf0001),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("rev"))
      .collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        (r.getAs[Long]("n"), r.getAs[Long]("rev"))).toMap
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed.nonEmpty, "join must actually match users to customers")
  }

  test("cdc apply: struct-max final state matches a windowed replay") {
    val r = ops.Events.queries.find(_.name == "q181_cdc_apply").get
      .fn(spark, sf0001).collect().head
    val nUsers = Tables.events(spark, sf0001)
      .select(col("user_id")).distinct().count()
    assert(r.getAs[Long]("n_keys") == nUsers)
    assert(r.getAs[Long]("n_live") + r.getAs[Long]("n_tombstoned") == nUsers)
    // windowed replay: the orthodox row_number formulation
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val last = Tables.events(spark, sf0001)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val live = last.filter(col("event_type") =!= "error")
      .agg(count(lit(1)), sum(round(col("value") * 100, 0).cast("long")))
      .head()
    assert(r.getAs[Long]("n_live") == live.getLong(0))
    assert(r.getAs[Long]("live_sum_cents") == live.getLong(1))
  }

  test("funnel latency: quantiles ordered, conversions bounded by purchasers") {
    val r = ops.Events.queries.find(_.name == "q182_funnel_latency").get
      .fn(spark, sf0001).collect().head
    val n = r.getAs[Long]("n_converted")
    assert(n > 0, "the corpus must contain view-then-purchase users")
    val purchasers = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    assert(n <= purchasers)
    val (p50, p90, mx) = (r.getAs[Double]("p50_hours"),
      r.getAs[Double]("p90_hours"), r.getAs[Long]("max_hours"))
    assert(p50 >= 0 && p50 <= p90 && p90 <= mx.toDouble)
    // one-month corpus: a first-view→first-purchase delay fits the span
    assert(mx <= 31L * 24)
  }

  test("variant json: bucket census conserves events, absent path never hits") {
    val rows = ops.Events.queries.find(_.name == "q184_variant_json").get
      .fn(spark, sf0001).collect()
    val total = Tables.events(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      val (b, n, sk) = (r.getAs[Int]("bucket"), r.getAs[Long]("n"),
        r.getAs[Long]("sum_k"))
      assert(b >= 0, "props k is nonnegative")
      // every k in bucket b lies in [10b, 10b+9]
      assert(sk >= 10L * b * n && sk <= (10L * b + 9) * n,
        s"bucket $b sum $sk outside its bounds for $n rows")
      assert(r.getAs[Long]("n_absent_hits") == 0L,
        "variant_get on a missing path must be null for every row")
    }
  }

  test("abandonment: cohorts cover every viewer, complements q182 conversions") {
    val rows = ops.Events.queries.find(_.name == "q195_abandonment").get
      .fn(spark, sf0001).collect()
    val viewers = Tables.events(spark, sf0001)
      .filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_viewers")).sum == viewers,
      "every viewer lands in exactly one first-view cohort")
    rows.foreach { r =>
      val (n, a) = (r.getAs[Long]("n_viewers"), r.getAs[Long]("n_abandoned"))
      assert(a <= n)
      assert(math.abs(r.getAs[Double]("abandon_rate") - a.toDouble / n) < 1e-6)
    }
  }

  test("ordered listagg: rendered strings replay from collected names") {
    val rows = ops.Events.queries.find(_.name == "q196_ordered_listagg").get
      .fn(spark, sf0001).collect()
    assert(rows.length == 5, "five regions")
    rows.foreach { r =>
      val names = r.getAs[String]("nations").split(",")
      assert(names.length == r.getAs[Long]("n_nations"))
      assert(names.toSeq == names.toSeq.sorted, "canonical order is sorted")
      val md5ref = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getAs[String]("nations").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("nations_md5") == md5ref)
    }
  }

  test("stream recovery: resumed state equals batch corpus-plus-delta exactly") {
    val rows = ops.Events.queries.find(_.name == "q197_stream_recovery").get
      .fn(spark, sf0001).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("sum_cents"),
          r.getAs[Boolean]("resumed_incrementally"))).toMap
    assert(rows.nonEmpty)
    assert(rows.values.forall(_._3),
      "the resumed run must not replay already-checkpointed files")
    val batch = Tables.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("s"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("s"))).toMap
    batch.foreach { case (t, (n, sm)) =>
      val mult = if (t == "purchase") 2 else 1 // the delta re-lands purchases
      assert(rows(t)._1 == mult * n, s"$t count after recovery")
      assert(rows(t)._2 == mult * sm, s"$t cents after recovery")
    }
  }

  test("audience overlap: set algebra holds for every pair") {
    val rows = ops.Events.queries.find(_.name == "q202_audience_overlap").get
      .fn(spark, sf0001).collect()
    val nTypes = Tables.events(spark, sf0001)
      .select(col("event_type")).distinct().count().toInt
    assert(rows.length == nTypes * (nTypes - 1) / 2)
    rows.foreach { r =>
      val (both, a, b) = (r.getAs[Long]("n_both"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(both <= math.min(a, b), "intersection bounded by either side")
      val j = r.getAs[Double]("jaccard")
      assert(math.abs(j - both.toDouble / (a + b - both)) < 1e-6)
      assert(j >= 0 && j <= 1)
    }
  }

  test("dynamic sessions: long gaps bridge, counts conserve, one user replayed") {
    val rows = ops.Events.queries.find(_.name == "q203_dynamic_sessions").get
      .fn(spark, sf0001).collect()
    val total = Tables.events(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sessions") >= 1)
      assert(r.getAs[Long]("max_session_n") <= r.getAs[Long]("n_events"))
    }
    // replay one user's running-max-end sessionization on the driver
    val uid = rows.head.getAs[Long]("user_id")
    val evs = Tables.events(spark, sf0001)
      .filter(col("user_id") === uid)
      .select(unix_micros(col("ts").cast("timestamp")).as("t"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1), r0.getString(2)))
      .sortBy(e => (e._1, e._2))
    var (maxEnd, sessions) = (Long.MinValue, 0)
    evs.foreach { case (t, _, tp) =>
      if (t >= maxEnd) sessions += 1
      val gap = tp match {
        case "purchase" => 3600000000L
        case "error" => 300000000L
        case _ => 1800000000L
      }
      maxEnd = math.max(maxEnd, t + gap)
    }
    assert(rows.head.getAs[Long]("n_sessions") == sessions,
      s"user $uid sessions mismatch replay $sessions")
  }

  test("purge cascade: hops nest and erased set matches q181") {
    val r = ops.Events.queries.find(_.name == "q204_purge_cascade").get
      .fn(spark, sf0001).collect().head
    val q181 = ops.Events.queries.find(_.name == "q181_cdc_apply").get
      .fn(spark, sf0001).collect().head
    assert(r.getAs[Long]("n_erased_users") == q181.getAs[Long]("n_tombstoned"),
      "the purge set IS q181's tombstoned key set")
    assert(r.getAs[Long]("ev_rows") >= r.getAs[Long]("n_erased_users"),
      "every erased user has at least their tombstone event")
    assert(r.getAs[Long]("li_rows") >= r.getAs[Long]("ord_rows") ||
      r.getAs[Long]("ord_rows") == 0,
      "every order carries at least one line at these SFs")
  }

  test("foreachBatch merge: final state table equals the batch aggregate") {
    val rows = ops.Events.queries.find(_.name == "q208_foreachbatch_merge")
      .get.fn(spark, sf0001).collect()
    assert(rows.forall(_.getAs[Boolean]("merged_ok")))
    val batch = Tables.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("s"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("s"))).toMap
    assert(rows.map(r => r.getAs[String]("event_type") ->
      (r.getAs[Long]("n_events"), r.getAs[Long]("sum_cents"))).toMap == batch)
  }

  test("watermark drops: emitted windows are fresh-only and finalized") {
    val rows = ops.Events.queries.find(_.name == "q213_watermark_drops").get
      .fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("late_dropped_ok")))
    // every emitted window must match the fresh-only batch count exactly
    // (a single late row leaking in would inflate a day-5-or-earlier
    // window into existence or a later count upward)
    val freshOnly = Tables.events(spark, sf0001)
      .filter(dayofmonth(col("ts")) > 5)
      .groupBy(dayofmonth(col("ts")).as("d"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Int]("d") -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val d = r.getAs[java.sql.Timestamp]("day_start").toLocalDateTime
      assert(freshOnly(d.getDayOfMonth) == r.getAs[Long]("n_events"),
        s"window $d contaminated or miscounted")
      assert(d.getDayOfMonth > 5, "no late-window may be emitted")
    }
  }

  test("activity streaks: histogram accounts for every user, synthetic runs") {
    val rows = graft.SparkEntry.queries("q226_activity_streaks")(spark, sf0001)
      .collect()
    val nUsers = Tables.events(spark, sf0001)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers)
    assert(rows.forall(_.getAs[Long]("streak_days") >= 1))
    // synthetic: 3 consecutive days, gap, 2 consecutive → longest = 3;
    // duplicate events on one day must not split or extend a run
    val ev = Seq(
      (7L, ts("2024-03-01 10:00:00")), (7L, ts("2024-03-01 22:00:00")),
      (7L, ts("2024-03-02 01:00:00")), (7L, ts("2024-03-03 23:59:59")),
      (7L, ts("2024-03-06 12:00:00")), (7L, ts("2024-03-07 12:00:00")))
      .toDF("user_id", "ts")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val streak = ev.select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
      .withColumn("grp",
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long")
          - row_number().over(w))
      .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("len"))
      .groupBy(col("user_id")).agg(max(col("len")).as("streak"))
      .head().getAs[Long]("streak")
    assert(streak == 3L)
  }

  test("session paths: totals account for every event; wilson bound sane") {
    val paths = graft.SparkEntry.queries("q227_session_paths")(spark, sf0001)
      .collect()
    assert(paths.length == 10)
    // counts are descending with path tie-break
    val ns = paths.map(_.getAs[Long]("n_sessions")).toSeq
    assert(ns == ns.sorted.reverse)
    // every path is a '>' join of known event types
    val types = Set("view", "click", "purchase", "signup", "error")
    paths.foreach { p =>
      assert(p.getAs[String]("path").split(">").forall(types.contains))
    }
    val bursts = graft.SparkEntry.queries("q229_error_bursts")(spark, sf0001)
      .collect()
    val p0 = {
      val t = Tables.events(spark, sf0001)
        .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("k"), count(lit(1)).as("n")).head()
      t.getAs[Long]("k").toDouble / t.getAs[Long]("n")
    }
    bursts.foreach { b =>
      val rate = b.getAs[Double]("err_rate")
      val lb = b.getAs[Double]("wilson_lb")
      assert(lb <= rate, "lower bound may never exceed the point estimate")
      assert(lb > p0, "alerting buckets must clear the baseline at the LB")
      assert(b.getAs[Long]("n_errors") <= b.getAs[Long]("n_events"))
      assert(b.getAs[Long]("bucket") % 21600 == 0)
    }
  }

  test("funnel hazards: nested risk sets, step-2 risk = step-1 converts") {
    val rows = graft.SparkEntry.queries("q247_funnel_hazard")(spark, sf0001)
      .collect().sortBy(_.getAs[Int]("step"))
    assert(rows.length == 2)
    val (s1, s2) = (rows(0), rows(1))
    assert(s1.getAs[Long]("n_converted") == s2.getAs[Long]("n_at_risk"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_at_risk"))
      val h = r.getAs[Double]("hazard")
      assert(h >= 0.0 && h <= 1.0)
    }
    // decile grid: cells partition the corpus, deciles are near-equal
    val grid = graft.SparkEntry.queries("q245_decile_grid")(spark, sf0001)
      .collect()
    val total = Tables.lineitem(spark, sf0001).count()
    assert(grid.map(_.getAs[Long]("n")).sum == total)
    val perP = grid.groupBy(_.getAs[Int]("price_decile"))
      .map(_._2.map(_.getAs[Long]("n")).sum)
    assert(perP.max - perP.min <= 1, "ntile marginals must be near-equal")
  }

  test("locf accounting + stickiness bounds") {
    val locf = graft.SparkEntry.queries("q252_locf_fill")(spark, sf0001)
      .collect()
    val ev = Tables.events(spark, sf0001)
    assert(locf.map(_.getAs[Long]("n_events")).sum == ev.count())
    assert(locf.map(_.getAs[Long]("n_missing")).sum ==
      ev.filter(col("event_type") === "click").count())
    locf.foreach { r =>
      assert(r.getAs[Long]("n_filled") <= r.getAs[Long]("n_missing"))
      // filled values only exist where a fill happened
      if (r.getAs[Long]("n_filled") == 0)
        assert(r.getAs[Long]("filled_checksum") == 0L)
    }
    val st = graft.SparkEntry.queries("q251_stickiness")(spark, sf0001)
      .collect()
    st.foreach { r =>
      val s0 = r.getAs[Double]("stickiness")
      assert(s0 > 0.0 && s0 <= 1.0)
      assert(r.getAs[Long]("dau_sum") >= r.getAs[Long]("mau"))
    }
  }

  test("watermark calibration: quantiles ordered, lateness accounting") {
    val r = graft.SparkEntry.queries("q276_watermark_calibration")(
      spark, sf0001).head()
    assert(r.getAs[Long]("n_late") <= r.getAs[Long]("n_events"))
    val (p50, p95, p99, mx) = (r.getAs[Double]("p50_late_s"),
      r.getAs[Double]("p95_late_s"), r.getAs[Double]("p99_late_s"),
      r.getAs[Double]("max_late_s"))
    assert(p50 <= p95 && p95 <= p99 && p99 <= mx)
    assert(p50 >= 0.0)
  }

  test("stream-stream left outer join reaches full batch parity") {
    val r = graft.SparkEntry.queries("q267_stream_outer_join")(
      spark, sf0001).head()
    assert(r.getAs[Boolean]("parity_ok"),
      "flushed stream must equal the batch LEFT JOIN")
    // row accounting: every view appears at least once; unmatched +
    // matched compose the join output exactly
    val nViews = Tables.events(spark, sf0001)
      .filter(col("event_type") === "view").count()
    assert(r.getAs[Long]("n_rows") ==
      r.getAs[Long]("n_matched") + r.getAs[Long]("n_unmatched"))
    assert(r.getAs[Long]("n_rows") >= nViews)
    assert(r.getAs[Long]("n_unmatched") <= nViews)
  }

  test("shapley attribution: efficiency axiom + brute-force permutations") {
    val rows = graft.SparkEntry.queries("q260_shapley_attribution")(
      spark, sf0001).collect()
    assert(rows.length == 3)
    // rebuild the mask histogram directly
    val u = Tables.events(spark, sf0001)
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "purchase", col("ts"))).as("tp"),
        min(when(col("event_type") === "view", col("ts"))).as("tv"),
        min(when(col("event_type") === "click", col("ts"))).as("tc"),
        min(when(col("event_type") === "signup", col("ts"))).as("tsg"))
      .filter(col("tp").isNotNull)
      .select((when(col("tv") < col("tp"), 1).otherwise(0)
        + when(col("tc") < col("tp"), 2).otherwise(0)
        + when(col("tsg") < col("tp"), 4).otherwise(0)).as("mask"))
      .groupBy("mask").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    def v(s: Int): Long = (0 to 7).filter(m => (m & ~s) == 0).map(u).sum
    // brute force over all 6 orderings of the 3 channels
    val perms = Seq(1, 2, 4).permutations.toSeq
    val brute = Seq(1, 2, 4).map { ch =>
      ch -> perms.map { p =>
        val before = p.takeWhile(_ != ch).foldLeft(0)(_ | _)
        v(before | ch) - v(before)
      }.sum // Σ over 6 perms = 6·φ
    }.toMap
    val got = rows.map(r => r.getAs[String]("channel") ->
      r.getAs[Long]("phi_sixths")).toMap
    assert(got("view") == brute(1) && got("click") == brute(2) &&
      got("signup") == brute(4),
      s"closed form $got vs permutation sum $brute")
    // efficiency: Σφ·6 = 6·(v(C) − v(∅))
    assert(got.values.sum == 6 * (v(7) - v(0)))
  }

  test("retention decay: observable bases shrink, rates in [0,1]") {
    val rows = graft.SparkEntry.queries("q256_retention_decay")(spark, sf0001)
      .collect().sortBy(_.getAs[Int]("k"))
    assert(rows.nonEmpty)
    var lastBase = Long.MaxValue
    rows.foreach { r =>
      val base = r.getAs[Long]("n_base")
      assert(base <= lastBase, "later offsets can only have smaller bases")
      lastBase = base
      assert(r.getAs[Long]("n_active") <= base)
      val ret = r.getAs[Double]("retention")
      assert(ret >= 0.0 && ret <= 1.0)
      if (!r.isNullAt(4)) {
        val fitted = r.getAs[Double]("fitted")
        assert(fitted > 0.0 && fitted <= 1.5)
      }
    }
  }
}
