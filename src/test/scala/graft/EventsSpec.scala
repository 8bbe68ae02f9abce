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
}
