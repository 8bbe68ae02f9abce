package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Semantics of the round-3 operator families (ops.Advanced) pinned on
  * literal fixtures: range-join window edges, salted-join equivalence,
  * RANGE-frame peer exclusion, unpivot⊣pivot inversion. */
class AdvancedSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("range join window edges: [-1h, 0) — boundary view excluded, -1h included") {
    // purchase at 12:00; views at exactly -1h (in), -1h-1s (out), 12:00 (out)
    val p = Seq((1L, 7L, ts("2024-01-01 12:00:00")))
      .toDF("purchase_id", "p_user", "p_ts")
    val v = Seq(
      (7L, ts("2024-01-01 11:00:00"), 1.0), // exactly 1h before: included (>=)
      (7L, ts("2024-01-01 10:59:59"), 2.0), // over 1h before: excluded
      (7L, ts("2024-01-01 12:00:00"), 4.0), // at purchase ts: excluded (<)
      (8L, ts("2024-01-01 11:30:00"), 8.0)  // other user: excluded
    ).toDF("v_user", "v_ts", "v_value")
    val out = p.join(v,
        col("p_user") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("v_ts") < col("p_ts"), "left")
      .groupBy("purchase_id")
      .agg(count(col("v_ts")).as("n"), sum(col("v_value")).as("s"))
      .head()
    assert(out.getLong(1) == 1L && out.getDouble(2) == 1.0)
  }

  test("salted join equals the plain join (salt is result-invariant)") {
    val salted = SparkEntry.queries("q62_salted_join")(spark, sf0001)
      .collect().map(_.toSeq)
    val plain = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
      .collect().map(_.toSeq)
    assert(salted.sameElements(plain))
  }

  test("RANGE frame excludes same-second peers and spans value distance") {
    // user 1: events at t=0s, t=1s, t=1s (peer pair), t=3601s
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 10.0),
      (2L, 1L, ts("2024-01-01 00:00:01"), 20.0),
      (3L, 1L, ts("2024-01-01 00:00:01"), 40.0), // same-second peer of #2
      (4L, 1L, ts("2024-01-01 01:00:01"), 80.0)  // 3600s after #2/#3
    ).toDF("event_id", "user_id", "ts", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(unix_timestamp(col("ts")))
      .rangeBetween(-3600, -1)
    val got = df.select(col("event_id"),
        coalesce(sum(col("value")).over(w), lit(0.0)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.0)          // nothing precedes
    assert(got(2L) == 10.0)         // peer #3 excluded (same order value)
    assert(got(3L) == 10.0)         // symmetric: peer #2 excluded
    assert(got(4L) == 60.0)         // #2+#3 at exactly -3600 included, #1 at -3601 out
  }

  test("unpivot is pivot's inverse on the long/wide round trip") {
    val wide = Seq(("A", 1.0, 2.0), ("B", 3.0, 4.0)).toDF("k", "m1", "m2")
    val long = wide.unpivot(Array(col("k")), Array(col("m1"), col("m2")),
      "metric", "val")
    assert(long.count() == 4)
    val back = long.groupBy("k").pivot("metric", Seq("m1", "m2")).agg(first("val"))
      .orderBy("k").collect().map(_.toSeq)
    assert(back.sameElements(wide.orderBy("k").collect().map(_.toSeq)))
  }

  test("grouping sets emits exactly the requested groupings") {
    val out = SparkEntry.queries("q59_grouping_sets")(spark, sf0001).collect()
    // (flag, null), (null, status), (null, null) rows only — never (flag, status)
    assert(out.forall(r => r.isNullAt(0) || r.isNullAt(1)))
    assert(out.count(r => r.isNullAt(0) && r.isNullAt(1)) == 1) // one grand total
    val total = out.filter(r => r.isNullAt(0) && r.isNullAt(1)).head.getLong(2)
    assert(total == Tables.lineitem(spark, sf0001).count())
  }

  test("scd2: runs compress, intervals chain, last interval per key is open") {
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    // cust 1 flips P1→P2→P1 (the return to P1 must open a NEW interval);
    // the second P1 order on 01-05 extends a run, never splits it
    val src = Seq(
      (1L, d("2024-01-01"), 10L, "P1"), (1L, d("2024-01-05"), 11L, "P1"),
      (1L, d("2024-02-01"), 12L, "P2"), (1L, d("2024-03-01"), 13L, "P1"),
      (2L, d("2024-06-01"), 20L, "P9")).toDF("ck", "dt", "ok", "pri")
    val iv = ops.Advanced.scd2Intervals(src)
      .orderBy("ck", "valid_from").collect()
    assert(iv.map(r => (r.getAs[Long]("ck"), r.getAs[String]("pri"),
      r.getAs[Date]("valid_from").toString,
      Option(r.getAs[Date]("valid_to")).map(_.toString))).toSeq == Seq(
      (1L, "P1", "2024-01-01", Some("2024-02-01")),
      (1L, "P2", "2024-02-01", Some("2024-03-01")),
      (1L, "P1", "2024-03-01", None),
      (2L, "P9", "2024-06-01", None)))
    // intervals chain gaplessly per key: each valid_to is the next valid_from
    val byCk = iv.groupBy(_.getAs[Long]("ck"))
    byCk.values.foreach { rows =>
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Date]("valid_to") == b.getAs[Date]("valid_from"))
        case _ =>
      }
      assert(rows.last.isNullAt(rows.last.fieldIndex("valid_to")),
        "current interval must stay open")
    }
  }
}
