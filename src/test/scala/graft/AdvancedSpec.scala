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

  test("gini: matches a driver-side exact replay; Lorenz shares nest") {
    val r = SparkEntry.queries("q161_revenue_concentration")(spark, sf0001)
      .head()
    // independent replay: collect per-customer cents, sort, apply the
    // rank identity with plain Scala arithmetic
    val m = Tables.orders(spark, sf0001)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("m"))
      .collect().map(_.getAs[Long]("m")).sorted
    val n = m.length
    val total = m.sum
    val s = m.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    assert(r.getAs[Long]("n_customers") == n)
    assert(r.getAs[Long]("total_cents") == total)
    val gini = (2.0 * s - (n.toDouble + 1) * total) / (n.toDouble * total)
    assert(math.abs(r.getAs[Double]("gini") - gini) < 1e-6)
    assert(gini >= 0.0 && gini < 1.0)
    val top1 = m.takeRight(n / 100).sum
    val top10 = m.takeRight(n / 10).sum
    assert(r.getAs[Long]("top1_cents") == top1)
    assert(r.getAs[Long]("top10_cents") == top10)
    // Lorenz nesting: the top 1% can never out-earn the top 10%
    assert(r.getAs[Double]("top1_share") <= r.getAs[Double]("top10_share"))
  }

  test("skyline: survivors are mutually non-dominated and complete vs brute force") {
    val rows = SparkEntry.queries("q164_skyline")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Int]("p_size"),
        r.getAs[Long]("price_cents")))
    assert(rows.nonEmpty)
    val all = Tables.part(spark, sf0001)
      .select(col("p_partkey"), col("p_size"),
        round(col("p_retailprice") * 100, 0).cast("long").as("pc"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def dominates(j: (Long, Int, Long), i: (Long, Int, Long)) =
      j._3 <= i._3 && j._2 >= i._2 && (j._3 < i._3 || j._2 > i._2)
    val brute = all.filter(i => !all.exists(j => dominates(j, i)))
      .map(t => (t._1, t._2, t._3)).toSet
    assert(rows.toSet == brute, "bucket-prefilter skyline != brute force")
  }

  test("histogram: buckets tile the cents range, counts and sums conserve") {
    val rows = SparkEntry.queries("q165_histogram")(spark, sf0001).collect()
    val pc = Tables.lineitem(spark, sf0001)
      .select(round(col("l_extendedprice") * 100, 0).cast("long").as("pc"))
      .collect().map(_.getLong(0))
    assert(rows.map(_.getAs[Long]("n")).sum == pc.length)
    assert(rows.map(_.getAs[Long]("sum_cents")).sum == pc.sum)
    // buckets tile [min, max] contiguously and widths differ by at most 1
    val sorted = rows.sortBy(_.getAs[Int]("bucket"))
    assert(sorted.head.getAs[Long]("lo_cents") == pc.min)
    assert(sorted.last.getAs[Long]("hi_cents") == pc.max)
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi_cents") + 1 == b.getAs[Long]("lo_cents"))
      case _ =>
    }
    val widths = sorted.map(r =>
      r.getAs[Long]("hi_cents") - r.getAs[Long]("lo_cents") + 1)
    assert(widths.max - widths.min <= 1, "equi-width within integer rounding")
    // per-bucket recount from raw cents
    sorted.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents"))
      assert(r.getAs[Long]("n") == pc.count(x => x >= lo && x <= hi))
    }
  }

  test("hll cardinality: bands hold, exact union obeys set algebra") {
    val rows = graft.ops.Advanced.queries
      .find(_.name == "q177_hll_cardinality").get.fn(spark, sf0001).collect()
      .map(r => r.getAs[String]("scope") ->
        (r.getAs[Long]("n_exact"), r.getAs[Boolean]("est_ok"))).toMap
    assert(rows.keySet == Set("purchase", "view", "view_or_purchase"))
    rows.values.foreach { case (n, ok) =>
      assert(n > 0); assert(ok, "sketch estimate outside the 2% band")
    }
    val (p, v, u) = (rows("purchase")._1, rows("view")._1,
      rows("view_or_purchase")._1)
    assert(u >= math.max(p, v) && u <= p + v,
      s"exact union $u outside [max($p,$v), $p+$v]")
  }

  test("recursive closure: depth census replays the ancestor chains exactly") {
    val rows = graft.ops.Advanced.queries
      .find(_.name == "q183_recursive_closure").get.fn(spark, sf0001)
      .collect()
      .map(r => r.getAs[Int]("depth") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("node_sum"))).toMap
    val seeds = Tables.part(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("p_size") === 50)
      .select("p_partkey").collect().map(_.getLong(0))
    assert(seeds.nonEmpty, "size-50 parts must exist at every SF")
    // replay the recursion in Scala
    val expect = scala.collection.mutable.Map[Int, (Long, Long)]()
    seeds.foreach { s0 =>
      var (node, depth) = (s0, 0)
      var go = true
      while (go) {
        val (n, sm) = expect.getOrElse(depth, (0L, 0L))
        expect(depth) = (n + 1, sm + node)
        if (node >= 10) { node /= 10; depth += 1 } else go = false
      }
    }
    assert(rows == expect.toMap,
      s"recursive census ${rows.toSeq.sortBy(_._1)} != replay ${expect.toSeq.sortBy(_._1)}")
  }

  test("local supplier volume: six-table join matches the two-step replay") {
    import org.apache.spark.sql.functions.{col, lit}
    val rows = graft.ops.Relational.queries
      .find(_.name == "q198_local_supplier_volume").get.fn(spark, sf0001)
      .collect()
    assert(rows.nonEmpty, "ASIA local-supplier lines exist at every SF")
    val revs = rows.map(_.getAs[Long]("rev_c4")).toSeq
    assert(revs == revs.sorted.reverse)
    // independent replay: count the same join via a different composition
    // (semi-join chain instead of the 6-way inner join)
    val asiaNations = Tables.nation(spark, sf0001)
      .join(Tables.region(spark, sf0001)
        .filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey")).collect()
      .map(_.get(0).asInstanceOf[Number].longValue).toSet
    val nLines = rows.map(_.getAs[Long]("n_lines")).sum
    val replay = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sf0001),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .filter(col("s_nationkey").isin(asiaNations.toSeq: _*))
      .count()
    assert(nLines == replay, s"6-way join lines $nLines != replay $replay")
  }

  test("rolling distinct: windows superset their days, sketch bands hold") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Advanced.queries
      .find(_.name == "q206_rolling_distinct").get.fn(spark, sf0001)
      .collect()
      .map(r => r.getAs[Int]("win_day") ->
        (r.getAs[Long]("n_exact"), r.getAs[Boolean]("est_ok"))).toMap
    assert(rows.nonEmpty)
    assert(rows.values.forall(_._2), "every window inside the 2% band")
    // each window's rolling distinct dominates its own single day's
    val perDay = Tables.events(spark, sf0001)
      .groupBy(dayofmonth(col("ts")).cast("int").as("d"))
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getAs[Int]("d") -> r.getAs[Long]("u")).toMap
    rows.foreach { case (d, (ex, _)) =>
      assert(ex >= perDay(d), s"window $d smaller than its own day")
    }
    // rolling counts are monotone under window containment for the first
    // seven days (window k ⊆ window k+1 there)
    val first = rows.keys.toSeq.sorted.take(7)
    first.sliding(2).foreach {
      case Seq(a, b) => assert(rows(a)._1 <= rows(b)._1)
      case _ =>
    }
  }

  test("crosstab: wide counts equal the long-form census") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val rows = graft.ops.Relational.queries
      .find(_.name == "q211_crosstab").get.fn(spark, sf0001).collect()
    val long = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val f = r.getAs[String]("flag_status")
      assert(r.getAs[Long]("F") == long.getOrElse((f, "F"), 0L))
      assert(r.getAs[Long]("O") == long.getOrElse((f, "O"), 0L))
    }
    assert(rows.map(r => r.getAs[Long]("F") + r.getAs[Long]("O")).sum ==
      Tables.lineitem(spark, sf0001).count())
  }

  test("sampleBy: every stratum inside its binomial band") {
    val rows = graft.ops.Relational.queries
      .find(_.name == "q212_sample_by").get.fn(spark, sf0001).collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getAs[Boolean]("band_ok"),
      s"stratum ${r.getAs[String]("flag")} outside its band"))
  }

  test("dominant supplier: dominance is unique per part") {
    val r = graft.ops.Relational.queries
      .find(_.name == "q199_dominant_supplier").get.fn(spark, sf0001)
      .collect().head
    // strict majority ⇒ at most one dominant supplier per part
    assert(r.getAs[Long]("n_dominant_pairs") == r.getAs[Long]("n_parts"),
      "a part can have at most one strict-majority supplier")
    assert(r.getAs[Long]("n_suppliers") <= r.getAs[Long]("n_dominant_pairs"))
    assert(r.getAs[Long]("dominated_qty") >= r.getAs[Long]("n_dominant_pairs"))
  }

  test("join estimate: actual cross-pins q131, estimate in sane range") {
    val r = SparkEntry.queries("q266_join_estimate")(spark, sf0001).head()
    val q131 = SparkEntry.queries("q131_join_skew_stats")(spark, sf0001)
      .head()
    assert(r.getAs[Long]("actual_rows") ==
      q131.getAs[Long]("est_join_rows"),
      "ground truth must equal q131's exact join cardinality")
    val ratio = r.getAs[Double]("est_over_actual")
    assert(ratio > 0.1 && ratio < 10.0,
      s"System-R estimate off by ${ratio}x — bucketing broken")
  }
}
