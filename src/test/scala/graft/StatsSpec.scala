package graft

import graft.ops.Stats
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {

  private def run(name: String) =
    Stats.queries.find(_.name == name).get.fn(spark, sf0001)

  private def eventCents = Tables.events(spark, sf0001)
    .filter(col("event_type").isin("purchase", "view"))
    .select(round(col("value") * 100, 0).cast("long").as("v"),
      (col("event_type") === "purchase").as("is_a"))

  test("mann-whitney: 2U matches brute-force pair counting") {
    val r = run("q166_mann_whitney").collect().head
    val a = eventCents.filter(col("is_a")).select(col("v").as("va"))
    val b = eventCents.filter(!col("is_a")).select(col("v").as("vb"))
    // 2·U_A = 2·#(x_A > x_B) + #(x_A = x_B), counted pair-by-pair
    val u2Brute = a.crossJoin(b)
      .agg(sum(when(col("va") > col("vb"), 2L)
        .when(col("va") === col("vb"), 1L).otherwise(0L)))
      .head().getLong(0)
    assert(r.getAs[Long]("u2_a") == u2Brute,
      "rank-sum U must equal the definitional pair count")
    assert(r.getAs[Long]("n_a") == a.count() && r.getAs[Long]("n_b") == b.count())
    // U is bounded by the pair count; z is finite
    assert(r.getAs[Long]("u2_a") >= 0 &&
      r.getAs[Long]("u2_a") <= 2 * r.getAs[Long]("n_a") * r.getAs[Long]("n_b"))
    assert(!r.getAs[Double]("z_stat").isNaN)
  }

  test("ks: distributed CDF matches the naive single-partition window") {
    val r = run("q167_ks_test").collect().head
    val counts = eventCents.groupBy(col("v"))
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("a"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("b"))
    val (nA, nB) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)
    val dBrute = counts
      .withColumn("cuma", sum(col("a")).over(w))
      .withColumn("cumb", sum(col("b")).over(w))
      .agg(max(abs(col("cuma") * nB - col("cumb") * nA)))
      .head().getLong(0)
    assert(r.getAs[Long]("d_num") == dBrute,
      "block-offset CDF must agree with the global-sort CDF")
    // ks_d is rounded to 6 decimals in the query output
    assert(math.abs(r.getAs[Double]("ks_d")
      - dBrute.toDouble / (nA.toDouble * nB)) < 1e-6)
  }

  test("benford: expected counts sum to n, digits complete, terms nonneg") {
    val rows = run("q168_benford").collect()
    assert(rows.map(_.getAs[Int]("digit")).toSeq == (1 to 9),
      "order totals cover all nine leading digits at every SF")
    val nTotal = rows.map(_.getAs[Long]("n_obs")).sum
    val expSum = rows.map(_.getAs[Double]("n_expected")).sum
    // Σ_d log10(1+1/d) = 1 exactly, so expected counts must total n
    assert(math.abs(expSum - nTotal) < 1e-3)
    rows.foreach(r => assert(r.getAs[Double]("chi2_term") >= 0))
  }

  test("entropy: bounded by log2(n_types), event counts conserved") {
    val rows = run("q170_entropy_profile").collect()
    assert(rows.length >= 28, "one row per day of the one-month corpus")
    val total = Tables.events(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_bits")
      val k = r.getAs[Long]("n_types")
      assert(h >= 0 && h <= math.log(k.toDouble) / math.log(2.0) + 1e-9,
        s"entropy $h outside [0, log2($k)]")
    }
  }

  test("cusum: one nation's scan matches a driver-side recomputation") {
    val rows = run("q171_cusum_changepoint").collect()
    val byNk = rows.map(r => r.getAs[Number]("nk").longValue -> r).toMap
    val nk0 = byNk.keys.min
    val months = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") === nk0)
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("mo"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev"))
      .orderBy(col("y"), col("mo"))
      .collect().map(r => (r.getAs[Int]("y") * 100 + r.getAs[Int]("mo"),
        r.getAs[Long]("rev")))
    val n = months.length.toLong
    val total = months.map(_._2).sum
    var cum = 0L
    val devs = months.zipWithIndex.map { case ((ym, rev), i) =>
      cum += rev; (ym, math.abs(n * cum - (i + 1) * total))
    }
    val maxDev = devs.map(_._2).max
    val cpYm = devs.filter(_._2 == maxDev).map(_._1).min
    val r0 = byNk(nk0)
    assert(r0.getAs[Long]("n_months") == n)
    assert(r0.getAs[Long]("total_cents") == total)
    assert(r0.getAs[Long]("max_dev") == maxDev)
    assert(r0.getAs[Int]("cp_y") * 100 + r0.getAs[Int]("cp_mo") == cpYm)
  }

  test("kendall: pair categories partition n(n-1)/2, tau_b in [-1,1]") {
    val rows = run("q172_kendall_tau").collect()
    assert(rows.nonEmpty)
    // within-cell pairs are the only both-tied pairs (cells are distinct
    // (q, dc) combos), so the five categories must partition all pairs
    val bothTied = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag").as("g"),
        col("l_quantity").cast("long"),
        round(col("l_discount") * 100, 0).cast("long"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("g"))
      .agg(sum(col("c") * (col("c") - 1) / 2).cast("long").as("bt"))
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("bt")).toMap
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      val parts = r.getAs[Long]("conc") + r.getAs[Long]("disc") +
        r.getAs[Long]("tie_q") + r.getAs[Long]("tie_d") +
        bothTied(r.getAs[String]("g"))
      assert(parts == n * (n - 1) / 2,
        s"pair categories must partition all ${n * (n - 1) / 2} pairs")
      val tau = r.getAs[Double]("tau_b")
      assert(tau >= -1.0 && tau <= 1.0)
    }
  }

  test("theil-sen: quartiles ordered, pair count exact, median matches brute force") {
    val r = run("q175_theil_sen").collect().head
    val n = r.getAs[Long]("n_months")
    assert(r.getAs[Long]("n_pairs") == n * (n - 1) / 2)
    val (q1, med, q3) = (r.getAs[Double]("slope_q1"),
      r.getAs[Double]("ts_slope"), r.getAs[Double]("slope_q3"))
    assert(q1 <= med && med <= q3)
    // brute-force: collect the monthly frame, enumerate pairs in Scala
    val months = Tables.orders(spark, sf0001)
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .as("idx"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev"))
      .collect().map(r0 => (r0.getAs[Int]("idx"), r0.getAs[Long]("rev")))
      .sortBy(_._1)
    val slopes = (for {
      i <- months.indices; j <- (i + 1) until months.length
    } yield (months(j)._2 - months(i)._2).toDouble /
        (months(j)._1 - months(i)._1)).sorted
    val k = slopes.length
    val bruteMed = if (k % 2 == 1) slopes(k / 2)
      else (slopes(k / 2 - 1) + slopes(k / 2)) / 2
    assert(math.abs(med - bruteMed) < 1e-6,
      s"theil-sen median $med vs brute $bruteMed")
  }

  test("poisson bootstrap: replicate mass near n, means bracket the sample mean") {
    val rows = run("q176_poisson_bootstrap").collect()
    assert(rows.length == 32)
    assert(rows.map(_.getAs[Int]("b")).toSeq == (0 until 32))
    val sample = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)), avg(round(col("value") * 100, 0).cast("long")))
      .head()
    val (n, sampleMean) = (sample.getLong(0), sample.getDouble(1))
    rows.foreach { r =>
      // Poisson(1) total mass: mean n, sd ~ sqrt(n) — allow 5 sigma
      val nEff = r.getAs[Long]("n_eff")
      assert(math.abs(nEff - n) <= 5 * math.sqrt(n.toDouble) + 10,
        s"replicate mass $nEff far from $n")
      assert(r.getAs[Long]("sum_cents") >= 0)
    }
    val means = rows.map(_.getAs[Double]("mean_cents"))
    val grand = means.sum / means.length
    val se = math.sqrt(means.map(m => (m - grand) * (m - grand)).sum
      / (means.length - 1))
    assert(math.abs(grand - sampleMean) <= 5 * se + 1.0,
      s"bootstrap grand mean $grand vs sample $sampleMean (se $se)")
  }

  test("isotonic: monotone, mean-preserving, and equal to MLlib's PAVA") {
    val rows = run("q185_isotonic").collect()
      .map(r => (r.getAs[Int]("x_cents"), r.getAs[Long]("n"),
        r.getAs[Double]("avg_y"), r.getAs[Double]("iso_pred")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._4 + 1e-9,
        s"isotonic fit must be nondecreasing: $a then $b")
      case _ =>
    }
    // the L2 projection preserves the weighted mean
    val wMean = rows.map(r => r._2 * r._3).sum / rows.map(_._2).sum
    val wFit = rows.map(r => r._2 * r._4).sum / rows.map(_._2).sum
    assert(math.abs(wMean - wFit) < 1e-4,
      s"weighted mean $wMean not preserved by fit $wFit")
    // independent algorithm: MLlib's PAVA on the same aggregated points
    import org.apache.spark.ml.regression.IsotonicRegression
    val pts = spark.createDataFrame(rows.toSeq.map(r =>
      (r._3, r._1.toDouble, r._2.toDouble))).toDF("label", "features", "weight")
    val model = new IsotonicRegression().setWeightCol("weight").fit(pts)
    rows.foreach { r =>
      val pava = model.predict(r._1.toDouble)
      assert(math.abs(pava - r._4) < 1e-5,
        s"minimax fit ${r._4} != PAVA $pava at x=${r._1}")
    }
  }

  test("did uplift: cells partition the table, estimate replays from cells") {
    val r = run("q189_did_uplift").collect().head
    val cells = Seq("n_tp", "n_t0", "n_cp", "n_c0").map(r.getAs[Long])
    assert(cells.forall(_ > 0), "all four DiD cells must be populated")
    assert(cells.sum == Tables.lineitem(spark, sf0001).count())
    val Seq(stp, st0, scp, sc0) =
      Seq("s_tp", "s_t0", "s_cp", "s_c0").map(r.getAs[Long])
    val did = (stp.toDouble / cells(0) - st0.toDouble / cells(1)) -
      (scp.toDouble / cells(2) - sc0.toDouble / cells(3))
    assert(math.abs(r.getAs[Double]("did_qty") - did) < 1e-6)
  }

  test("moments: variance matches var_pop, shape ratios plausible") {
    val rows = run("q214_moment_stats").collect()
    val ref = Tables.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(var_pop(round(col("value") * 100, 0).cast("long")).as("v"),
        avg(round(col("value") * 100, 0).cast("long")).as("mu"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("v"), r.getAs[Double]("mu"))).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(math.abs(r.getAs[Double]("var_pop") - ref(t)._1)
        < 1e-4 * ref(t)._1, s"$t variance vs built-in var_pop")
      assert(math.abs(r.getAs[Double]("mean_cents") - ref(t)._2) < 1e-3)
      // value is a bounded nonneg distribution: shape stays in sane range
      assert(math.abs(r.getAs[Double]("skew_pop")) < 10)
      assert(r.getAs[Double]("kurt_excess") > -3 &&
        r.getAs[Double]("kurt_excess") < 100)
    }
  }

  test("ols: slope/intercept agree with covar_pop/var_pop built-ins") {
    val rows = run("q173_grouped_ols").collect()
    val x = round(col("l_discount") * 100, 0).cast("long").cast("double")
    val y = col("l_quantity")
    val ref = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg((covar_pop(x, y) / var_pop(x)).as("slope"),
        (avg(y) - covar_pop(x, y) / var_pop(x) * avg(x)).as("icept"))
      .collect()
      .map(r => r.getAs[String]("p_brand") ->
        (r.getAs[Double]("slope"), r.getAs[Double]("icept"))).toMap
    assert(rows.length == ref.size)
    rows.foreach { r =>
      val (s0, i0) = ref(r.getAs[String]("p_brand"))
      assert(math.abs(r.getAs[Double]("slope") - s0) < 1e-5,
        s"slope mismatch for ${r.getAs[String]("p_brand")}")
      assert(math.abs(r.getAs[Double]("intercept") - i0) < 1e-5)
    }
  }

  test("kaplan-meier: estimator invariants + risk-set accounting") {
    val rows = run("q215_kaplan_meier").collect()
    assert(rows.nonEmpty)
    // subjects = customers with orders; first event row's risk set must
    // equal N minus everyone who left strictly before it
    val n = Tables.orders(spark, sf0001)
      .select(col("o_custkey")).distinct().count()
    assert(rows.head.getAs[Long]("n_risk") <= n)
    // survival starts ≤ 1, is strictly positive until (possibly) the last
    // step, and NEVER increases; risk sets strictly decrease with t
    var lastS = 1.0
    var lastN = Long.MaxValue
    var lastT = -1
    rows.foreach { r =>
      val t = r.getAs[Int]("t_days")
      val s0 = r.getAs[Double]("survival")
      val nr = r.getAs[Long]("n_risk")
      assert(t > lastT)
      assert(s0 <= lastS + 1e-9, s"survival increased at t=$t")
      assert(s0 >= 0.0 && s0 <= 1.0)
      assert(nr < lastN, s"risk set did not shrink at t=$t")
      assert(r.getAs[Long]("d_events") > 0)
      assert(r.getAs[Long]("d_events") <= nr)
      lastS = s0; lastN = nr; lastT = t
    }
    // every subject leaves the risk set exactly once: events + censored
    // across ALL durations (event rows only carry that duration's d and c)
    assert(rows.map(_.getAs[Long]("d_events")).sum <= n)
  }

  test("eb shrinkage: posterior pulls every supplier toward the prior mean") {
    val rows = run("q218_eb_shrinkage").collect()
    assert(rows.nonEmpty)
    val mu = {
      val rates = rows.map(r =>
        r.getAs[Long]("n_returned").toDouble / r.getAs[Long]("n_lines"))
      rates.sum / rates.length
    }
    rows.foreach { r =>
      val raw = r.getAs[Double]("raw_rate")
      val eb = r.getAs[Double]("eb_rate")
      // shrinkage, never overshoot: eb lies between raw and the prior mean
      assert(math.abs(eb - mu) <= math.abs(raw - mu) + 1e-6,
        s"supplier ${r.getAs[Long]("s_suppkey")}: eb=$eb raw=$raw mu=$mu")
      assert((eb >= math.min(raw, mu) - 1e-6) &&
        (eb <= math.max(raw, mu) + 1e-6))
    }
  }

  test("natural breaks: contiguous cover + optimal vs naive splits") {
    val segs = run("q228_natural_breaks").collect()
    assert(segs.length == 3)
    val (lo, hi) = (segs.map(_.getAs[Long]("q_lo")),
      segs.map(_.getAs[Long]("q_hi")))
    assert(lo(1) == hi(0) + 1 && lo(2) == hi(1) + 1, "segments contiguous")
    segs.foreach { s0 =>
      val m = s0.getAs[Double]("mean_q")
      assert(m >= s0.getAs[Long]("q_lo") && m <= s0.getAs[Long]("q_hi"))
      assert(s0.getAs[Double]("sse") >= -1e-6)
    }
    // optimality: the chosen split's total SSE beats naive equal-width
    // thirds computed directly from the corpus
    val cells = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_quantity").cast("long").as("q"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("q") -> r.getAs[Long]("n")).toMap
    def sse(a: Long, b: Long): Double = {
      val xs = cells.filter { case (q, _) => q >= a && q <= b }
      val n = xs.values.sum.toDouble
      if (n == 0) 0.0
      else {
        val s = xs.map { case (q, c) => q.toDouble * c }.sum
        xs.map { case (q, c) => c * q.toDouble * q }.sum - s * s / n
      }
    }
    val (mn, mx) = (cells.keys.min, cells.keys.max)
    val w = (mx - mn) / 3
    val naive = sse(mn, mn + w) + sse(mn + w + 1, mn + 2 * w) +
      sse(mn + 2 * w + 1, mx)
    val opt = segs.map(_.getAs[Double]("sse")).sum
    assert(opt <= naive + 1e-6,
      s"optimal split $opt must not lose to equal-width thirds $naive")
  }

  test("exp gap fit: MLE + KS internal consistency") {
    val r = run("q231_exp_gap_fit").head()
    val (n, sg) = (r.getAs[Long]("n_gaps"), r.getAs[Long]("sum_days"))
    assert(n > 0 && sg >= n)
    assert(math.abs(r.getAs[Double]("lambda_hat") - n.toDouble / sg) < 1e-6)
    val d = r.getAs[Double]("ks_d")
    assert(d >= 0.0 && d <= 1.0)
    assert(r.getAs[Boolean]("reject_exp") ==
      (d > 1.358 / math.sqrt(n.toDouble)) ||
      math.abs(d - 1.358 / math.sqrt(n.toDouble)) < 1e-6)
  }

  test("cem att: treated accounting is complete, estimate is finite") {
    val r = run("q240_cem_att").head()
    val totalTreated = Tables.lineitem(spark, sf0001)
      .filter(col("l_discount") >= 0.05).count()
    assert(r.getAs[Long]("n_treated_matched")
      + r.getAs[Long]("n_treated_dropped") == totalTreated,
      "every treated line is either matched or reported dropped")
    assert(r.getAs[Long]("n_strata") > 0)
    assert(!r.getAs[Double]("att_cents").isNaN)
  }

  test("variance decomposition: non-negative components inside the total") {
    val r = run("q246_variance_decomp").head()
    val tot = r.getAs[Double]("ss_total_b")
    assert(tot > 0)
    assert(r.getAs[Double]("ss_dow_b") >= 0)
    assert(r.getAs[Double]("ss_month_b") >= 0)
    // the cell fit must explain at least each main effect alone
    assert(r.getAs[Double]("ss_interact_b") >= -1e-3)
    val (ed, em) = (r.getAs[Double]("eta2_dow"), r.getAs[Double]("eta2_month"))
    assert(ed >= 0 && ed <= 1 && em >= 0 && em <= 1)
    assert(r.getAs[Double]("ss_dow_b") + r.getAs[Double]("ss_month_b")
      + r.getAs[Double]("ss_interact_b") <= tot + 1e-3)
  }

  test("neyman allocation: sums exactly to budget, tracks N_h*sd_h") {
    val rows = run("q248_neyman_allocation").collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum == 1000L,
      "largest-remainder must land exactly on the budget")
    val weights = rows.map(r =>
      r.getAs[Long]("n_docs") * r.getAs[Double]("sd_chars"))
    val tot = weights.sum
    rows.zip(weights).foreach { case (r, w) =>
      // base-or-base+1 of the exact share
      val raw = 1000.0 * w / tot
      val a = r.getAs[Long]("alloc")
      assert(a >= math.floor(raw) - 1e-9 && a <= math.floor(raw) + 1,
        s"${r.getAs[String]("source")}: alloc $a vs raw $raw")
    }
  }

  test("mann-kendall + split balance internal consistency") {
    val mk = run("q277_mann_kendall").head()
    val n = mk.getAs[Long]("n_weeks")
    val smax = n * (n - 1) / 2
    val sStat = mk.getAs[Long]("s_stat")
    assert(math.abs(sStat) <= smax, "S is bounded by the pair count")
    assert(mk.getAs[Double]("var_s") > 0)
    // z and significance must agree with the emitted statistic
    val z = mk.getAs[Double]("z")
    assert(mk.getAs[Boolean]("trend_significant") == (math.abs(z) > 1.96))
    if (sStat == 0) assert(z == 0.0)
    val sb = run("q278_split_balance").head()
    assert(sb.getAs[Long]("n_customers") ==
      Tables.customer(spark, sf0001).count())
    assert(sb.getAs[Long]("df") == 4)
    assert(sb.getAs[Double]("chi2") >= 0.0)
  }

  test("sequential ab: looks nest, boundaries descend, counts monotone") {
    val rows = run("q257_sequential_ab").collect()
      .sortBy(_.getAs[Int]("look"))
    assert(rows.length == 3)
    val bounds = rows.map(_.getAs[Double]("boundary")).toSeq
    assert(bounds == bounds.sorted.reverse,
      "O'Brien-Fleming boundaries must descend across looks")
    var (pn0, px0, pn1, px1) = (0L, 0L, 0L, 0L)
    rows.foreach { r =>
      val (n0, x0) = (r.getAs[Long]("n_control"), r.getAs[Long]("conv_control"))
      val (n1, x1) = (r.getAs[Long]("n_variant"), r.getAs[Long]("conv_variant"))
      assert(n0 >= pn0 && x0 >= px0 && n1 >= pn1 && x1 >= px1,
        "cumulative looks can only grow")
      assert(x0 <= n0 && x1 <= n1)
      pn0 = n0; px0 = x0; pn1 = n1; px1 = x1
    }
  }
}
