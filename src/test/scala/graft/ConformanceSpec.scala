package graft

import graft.ops.Conformance
import org.apache.spark.sql.functions._

class ConformanceSpec extends SparkSpec {

  private def run(name: String) =
    Conformance.queries.find(_.name == name).get.fn(spark, sf0001)

  test("null semantics: the three-valued-logic identities hold per group") {
    val rows = run("q191_null_semantics").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nn, nnn) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"),
        r.getAs[Long]("n_not_null"))
      assert(nn > 0, "quantity 50 must occur in every returnflag group")
      assert(nn + nnn == n, "COUNT(*) = nulls + non-nulls")
      // aggregates skip NULLs: max came from the non-null domain (< 50)
      assert(r.getAs[Long]("max_q") < 50 && r.getAs[Long]("min_q") >= 1)
      // null-safe equality matches exactly the NULL rows
      assert(r.getAs[Long]("n_nullsafe_null") == nn)
      // q > 0 is UNKNOWN for NULLs, so it counts only non-null rows
      assert(r.getAs[Long]("n_cmp_true") == nnn)
      // GROUP BY folds all NULLs into ONE group
      assert(r.getAs[Long]("n_groups") == r.getAs[Long]("n_distinct") + 1)
    }
  }

  test("padding audit: shards partition the corpus, waste bounded below max-pad") {
    val rows = run("q192_padding_audit").collect()
    val total = Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.foreach { r =>
      val (nd, nb) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_buckets"))
      assert(nb >= 1 && nb <= 16 && nd >= nb)
      val (sc, pc) = (r.getAs[Long]("sum_chars"), r.getAs[Long]("pad_chars"))
      assert(pc >= 0 && pc + sc == pc + sc) // pad nonneg
      val ratio = r.getAs[Double]("pad_ratio")
      assert(ratio >= 0.0 && ratio < 1.0)
      assert(math.abs(ratio - pc.toDouble / (pc + sc)) < 1e-6,
        "ratio must recompute from the emitted integers")
    }
  }

  test("incremental refresh: merged partials equal the full recompute") {
    val rows = run("q193_incremental_refresh").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("merge_matches_full"),
        s"partial merge diverged for ${r.getAs[String]("event_type")}")
    }
    val total = Tables.events(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
  }

  test("weighted median: exact rank condition holds on a driver replay") {
    val r = run("q194_weighted_median").collect().head
    val (w, med) = (r.getAs[Long]("total_weight"),
      r.getAs[Long]("wmedian_cents"))
    val vals = Tables.lineitem(spark, sf0001)
      .select(round(col("l_extendedprice") * 100 / col("l_quantity"), 0)
        .cast("long").as("v"), col("l_quantity").cast("long").as("q"))
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    assert(vals.map(_._2).sum == w)
    val below = vals.filter(_._1 < med).map(_._2).sum
    val atOrBelow = vals.filter(_._1 <= med).map(_._2).sum
    // lower weighted median: cum(< med) < W/2 <= cum(<= med)
    assert(2 * below < w && 2 * atOrBelow >= w,
      s"median $med violates the weighted rank condition")
  }

  test("typed aggregation: the Dataset path equals the untyped plan row for row") {
    val typed = run("q207_typed_aggregation").collect()
      .map(r => r.getAs[String]("flag") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_cents"),
          r.getAs[Long]("max_qty"))).toMap
    val untyped = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("s"),
        max(col("l_quantity").cast("long")).as("m"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("n"), r.getAs[Long]("s"), r.getAs[Long]("m"))).toMap
    assert(typed == untyped, "typed and untyped aggregation must agree")
  }

  test("fk sweep: all seven edges reported, star schema is orphan-free") {
    val rows = run("q209_fk_sweep").collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphan_keys") == 0L,
        s"edge ${r.getAs[String]("edge")} has orphans in the test corpus")
    }
  }

  test("catalog stats: primary keys unique, ranges sane") {
    val rows = run("q210_catalog_stats").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == r.getAs[Long]("n_pk"),
        s"${r.getAs[String]("tbl")}: primary key must be unique")
      assert(r.getAs[Long]("pk_min") <= r.getAs[Long]("pk_max"))
    }
  }

  test("iso-year derivation (Thursday rule) pins known boundary dates") {
    import spark.implicits._
    // published ISO-8601 edge cases: calendar year ≠ ISO year
    val cases = Seq(
      ("1996-12-30", 1997, 1),  // Mon of 1997-W01
      ("1997-01-01", 1997, 1),
      ("1999-01-01", 1998, 53), // Fri of 1998-W53
      ("1995-01-01", 1994, 52), // Sun of 1994-W52
      ("2000-12-31", 2000, 52), // Sun of 2000-W52
      ("2001-01-01", 2001, 1))  // Mon of 2001-W01
    val got = cases.map(_._1).toDF("s")
      .withColumn("d", col("s").cast("date"))
      .withColumn("monday", date_trunc("week", col("d")).cast("date"))
      .select(col("s"),
        year(date_add(col("monday"), 3)).as("iso_year"),
        weekofyear(col("d")).as("iso_week"))
      .collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    cases.foreach { case (s, ey, ew) =>
      assert(got(s) == (ey, ew),
        s"$s: expected ISO $ey-W$ew, got ${got(s)}")
    }
  }

  test("q17-shape decorrelation equals an explicit aggregate-then-join") {
    val r = run("q233_q17_small_qty").head()
    val avgper = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_partkey").as("pk"))
      .agg(avg(col("l_quantity")).as("ak"))
    val manual = Tables.lineitem(spark, sf0001)
      .join(avgper, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.2) * col("ak"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("c"),
        countDistinct(col("l_partkey")).as("p")).head()
    assert(r.getAs[Long]("n_lines") == manual.getAs[Long]("n"))
    assert(r.getAs[Long]("rev_cents") == manual.getAs[Long]("c"))
    assert(r.getAs[Long]("n_parts") == manual.getAs[Long]("p"))
  }

  test("luhn audit matches a reference implementation on the same numbers") {
    def luhn(s: String): Boolean = {
      val digits = s.map(_ - '0')
      val total = digits.zipWithIndex.map { case (d0, i) =>
        if ((s.length - 1 - i) % 2 == 1) { val d2 = 2 * d0; if (d2 > 9) d2 - 9 else d2 }
        else d0
      }.sum
      total % 10 == 0
    }
    val r = run("q261_luhn_audit").head()
    val expected = Tables.orders(spark, sf0001)
      .select((col("o_orderkey") * 7919 + col("o_custkey")).cast("string")
        .as("acct")).collect()
      .count(row => luhn(row.getString(0)))
    assert(r.getAs[Long]("n_valid") == expected)
    assert(r.getAs[Double]("valid_share") > 0.02 &&
      r.getAs[Double]("valid_share") < 0.3, "mod-10 share near 1/10")
    // odds ratios: CI brackets the point estimate, cells recompose
    val odds = graft.SparkEntry.queries("q262_segment_odds")(spark, sf0001)
      .collect()
    val nCust = Tables.customer(spark, sf0001).count()
    assert(odds.map(r2 => r2.getAs[Long]("n_active")
      + r2.getAs[Long]("n_inactive")).sum == nCust)
    odds.foreach { o =>
      val or = o.getAs[Double]("odds_ratio")
      assert(o.getAs[Double]("ci_lo") <= or && or <= o.getAs[Double]("ci_hi"))
    }
  }

  test("key gap audit: anti-join gap arithmetic on rigged key sets") {
    import spark.implicits._
    // keys 1-3, 7, 9-10: missing {4,5,6,8} → 4 missing, 2 runs, first 4
    def audit(keys: Seq[Long]) = {
      val k = keys.toDF("key")
      val b = k.agg(min(col("key")).as("mn"), max(col("key")).as("mx"),
        count(lit(1)).as("n")).head()
      val runs = k.join(k.select((col("key") - 1).as("key")),
        Seq("key"), "left_anti").count()
      (b.getLong(1) - b.getLong(0) + 1 - b.getLong(2), runs - 1)
    }
    assert(audit(Seq(1L, 2L, 3L, 7L, 9L, 10L)) == ((4L, 2L)))
    assert(audit(Seq(5L, 6L, 7L)) == ((0L, 0L)))
    // and the registered query is self-consistent on real data
    val r = run("q242_key_gap_audit").head()
    assert(r.getAs[Long]("n_missing") >= r.getAs[Long]("n_gap_runs"))
    if (r.getAs[Long]("n_gap_runs") == 0) {
      assert(r.getAs[Long]("n_missing") == 0 && r.isNullAt(5))
    } else {
      assert(r.getAs[Long]("first_missing") > r.getAs[Long]("key_min"))
    }
  }

  test("q296: frame-exclusion emulation matches a driver brute force") {
    val rows = run("q296_frame_exclusion").collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_scored"), r.get(2), r.get(3))).toMap
    // brute-force the leave-one-out ±3 frame for three users directly
    // from the ordered value arrays — an independent formulation of the
    // same semantics (the oracle separately pins DuckDB's native EXCLUDE)
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val users = ev.select("user_id").distinct()
      .orderBy("user_id").limit(3).collect().map(_.getLong(0))
    users.foreach { u =>
      val vs = ev.filter(col("user_id") === u)
        .orderBy(col("ts"), col("event_id")).collect()
        .map(r => if (r.isNullAt(3)) None
                  else Some(math.round(r.getDouble(3) * 100)))
      val peer = vs.indices.flatMap { i =>
        val frame = (math.max(0, i - 3) to math.min(vs.length - 1, i + 3))
          .filter(_ != i).flatMap(vs(_))
        if (frame.isEmpty) None
        else Some(BigDecimal(frame.sum.toDouble / frame.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val (n, mn, mx) = rows(u)
      assert(n == peer.size, s"user $u: n_scored $n != brute ${peer.size}")
      if (peer.nonEmpty) {
        assert(math.abs(mn.asInstanceOf[Double] - peer.min) < 1e-9)
        assert(math.abs(mx.asInstanceOf[Double] - peer.max) < 1e-9)
      }
    }
  }
}
