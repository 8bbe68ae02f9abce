package graft

import graft.ops.Training
import org.apache.spark.sql.functions._

class TrainingSpec extends SparkSpec {

  private def run(name: String) =
    Training.queries.find(_.name == name).get.fn(spark, sf0001)

  /** The house tokenize (trim → lower → whitespace split), driver-side. */
  private def toks(text: String): Array[String] =
    text.trim.toLowerCase.split("[ \\t\\n\\f\\r]+", -1)

  private val stopEn = Set("the", "a", "and", "of", "to", "in", "is")

  test("q298: preference pairs match a per-user driver brute force") {
    val got = run("q298_preference_pairs").collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
         r.getAs[Long]("chosen_cents"), r.getAs[Long]("rejected_cents"),
         r.getAs[Long]("margin_cents"))).toMap
    val ev = Tables.events(spark, sf0001)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        // Spark round() is BigDecimal HALF_UP — mirror it exactly rather
        // than math.round (which floors negative halves differently)
        BigDecimal(r.getDouble(2) * 100)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val expected = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val mx = rows.map(_._3).max
      val mn = rows.map(_._3).min
      if (rows.size >= 2 && mx - mn >= 20000) {
        val chosen = rows.filter(_._3 == mx).map(_._2).min
        val rejected = rows.filter(_._3 == mn).map(_._2).min
        Some(u -> (chosen, rejected, mx, mn, mx - mn))
      } else None
    }
    assert(got.nonEmpty, "margin threshold filtered everything at sf0.001")
    assert(got == expected)
  }

  test("q299: budgeted selection is the greedy score-ordered prefix") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map { r =>
        val t = toks(r.getString(2))
        val hits = t.count(stopEn)
        (r.getLong(0), r.getString(1), t.length.toLong,
          hits.toLong * 1000 / t.length)
      }
    val budget = docs.map(_._3).sum / 2
    // greedy prefix under (score desc, doc_id asc)
    val ordered = docs.sortBy { case (id, _, _, sc) => (-sc, id) }
    var cum = 0L
    val sel = ordered.takeWhile { d => cum += d._3; cum <= budget }
    val expected = sel.groupBy(_._2)
      .map { case (l, ds) => l -> (ds.size.toLong, ds.map(_._3).sum) }
    val got = run("q299_token_budget_select").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_sel"), r.getAs[Long]("tok_sel"))).toMap
    assert(got.nonEmpty && got.values.map(_._1).sum == sel.size)
    assert(got == expected)
    // the selection genuinely binds: something was left out
    assert(sel.size < docs.length, "budget did not bind at sf0.001")
  }

  test("q300: allocation is the optimal integer water-fill level") {
    val avail = Tables.documents(spark, sf0001)
      .select(col("source"), col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        toks(r.getString(2)).length.toLong)
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val budget = avail.values.sum * 3 / 5
    def fill(l: Long): Long = avail.values.map(math.min(_, l)).sum
    // optimal level by binary search on the monotone fill function
    var (lo, hi) = (0L, avail.values.max)
    while (lo < hi) {
      val mid = (lo + hi + 1) / 2
      if (fill(mid) <= budget) lo = mid else hi = mid - 1
    }
    val level = lo
    val rows = run("q300_mixture_waterfill").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet
      == avail.keySet)
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val (av, al, ex) = (r.getAs[Long]("avail_tok"),
        r.getAs[Long]("alloc_tok"), r.getAs[Boolean]("exhausted"))
      assert(av == avail(k), s"cell $k avail")
      assert(al == math.min(av, level), s"cell $k alloc at level $level")
      assert(ex == (av <= level), s"cell $k exhausted flag")
    }
    // optimality: the level fits, one more does not (budget < total here)
    assert(fill(level) <= budget && fill(level + 1) > budget)
    // the scenario exercises both regimes at sf0.001
    assert(rows.exists(_.getAs[Boolean]("exhausted")) &&
      rows.exists(!_.getAs[Boolean]("exhausted")),
      "sf0.001 should produce both exhausted and level-limited cells")
  }

  test("q301: Hamilton apportionment sums exactly to the budget and is optimal") {
    val cnt = Tables.documents(spark, sf0001)
      .select(col("source")).collect().map(_.getString(0))
      .groupBy(identity).map { case (s, xs) => s -> xs.length.toLong }
    val nn = cnt.values.sum
    val n = nn / 10
    val base = cnt.map { case (s, c) => s -> n * c / nn }
    val rem = cnt.map { case (s, c) => s -> n * c % nn }
    val extra = (n - base.values.sum).toInt
    val winners = cnt.keys.toSeq.sortBy(s => (-rem(s), s)).take(extra).toSet
    val want = cnt.map { case (s, c) =>
      s -> (c, base(s) + (if (winners(s)) 1L else 0L), winners(s)) }
    val rows = run("q301_sample_apportion").collect()
    val got = rows.map(r => r.getString(0) ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("alloc"),
       r.getAs[Boolean]("got_extra"))).toMap
    assert(got == want)
    assert(got.values.map(_._2).sum == n, "allocations must sum EXACTLY to n")
    // Hamilton optimality: every winner's remainder >= every loser's
    val wMax = rem.filter(kv => !winners(kv._1)).values
    if (extra > 0 && wMax.nonEmpty)
      assert(winners.map(rem).min >= wMax.max)
  }

  test("q302: interleave positions match the driver's full smooth round-robin") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nn = docs.length.toLong
    val bySrc = docs.groupBy(_._2)
    val slotted = bySrc.toSeq.flatMap { case (s, ds) =>
      val n_s = ds.length.toLong
      ds.map(_._1).sorted.zipWithIndex.map { case (id, i) =>
        val j = i + 1L
        (s, j, (2 * j - 1) * nn / (2 * n_s))
      }
    }
    val ordered = slotted.sortBy { case (s, j, slot) => (slot, s, j) }
    val pos = ordered.zipWithIndex.map { case ((s, _, _), i) => (s, i + 1L) }
    val want = pos.groupBy(_._1).map { case (s, ps) =>
      val xs = ps.map(_._2).sorted
      val gaps = xs.zip(xs.drop(1)).map { case (a, b) => b - a }
      s -> (xs.length.toLong, xs.head, xs.last,
        if (gaps.isEmpty) null else gaps.min,
        if (gaps.isEmpty) null else gaps.max)
    }
    val got = run("q302_epoch_interleave").collect().map(r =>
      r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("first_pos"),
        r.getAs[Long]("last_pos"), r.get(4), r.get(5))).toMap
    assert(got == want)
    // evenness: no source's largest gap exceeds twice its ideal spacing + 1
    got.foreach { case (s, (nD, _, _, _, mx)) =>
      if (mx != null)
        assert(mx.asInstanceOf[Long] <= 2 * (nn / nD) + 2, s"source $s gap $mx")
    }
  }

  test("q303: pacing schedule partitions ranks into N/E-sized competence bands") {
    val rows = run("q303_curriculum_pacing").collect()
    val nn = rows.map(_.getAs[Long]("n_docs")).sum
    // epochs 1..5, each epoch's global rank band is (N(e-1)/5, Ne/5]
    val byEpoch = rows.groupBy(_.getAs[Long]("first_epoch"))
    assert(byEpoch.keySet.subsetOf((1L to 5L).toSet))
    byEpoch.foreach { case (e, rs) =>
      val lo = rs.map(_.getAs[Long]("min_rank")).min
      val hi = rs.map(_.getAs[Long]("max_rank")).max
      val n = rs.map(_.getAs[Long]("n_docs")).sum
      assert(lo > nn * (e - 1) / 5 && hi <= (nn * e + 4) / 5,
        s"epoch $e band [$lo,$hi] outside its competence slice")
      assert(n == hi - lo + 1,
        s"epoch $e counts inconsistent with its contiguous rank band")
    }
    // every rank 1..N is covered exactly once across epochs
    assert(byEpoch.values.flatten.map(_.getAs[Long]("n_docs")).sum == nn)
    // difficulty ordering: epoch bands are increasing in rank
    val spans = byEpoch.toSeq.sortBy(_._1).map { case (_, rs) =>
      (rs.map(_.getAs[Long]("min_rank")).min,
       rs.map(_.getAs[Long]("max_rank")).max) }
    spans.zip(spans.drop(1)).foreach { case ((_, h), (l2, _)) =>
      assert(h < l2, "epoch rank bands must be disjoint and increasing")
    }
  }

  test("q304: kappa millionths match the driver's float kappa from raw cells") {
    val r = run("q304_kappa_agreement").collect().head
    val (tt, tf, ft, ff) = (r.getAs[Long]("tt"), r.getAs[Long]("tf"),
      r.getAs[Long]("ft"), r.getAs[Long]("ff"))
    val n = (tt + tf + ft + ff).toDouble
    assert(r.getAs[Long]("n") == n.toLong)
    val po = (tt + ff) / n
    val pe = ((tt + tf) * (tt + ft) + (ft + ff) * (tf + ff)) / (n * n)
    val kappa = (po - pe) / (1 - pe)
    assert(math.abs(r.getAs[Long]("po_micro") / 1e6 - po) < 1e-6)
    assert(math.abs(r.getAs[Long]("pe_micro") / 1e6 - pe) < 1e-6)
    assert(math.abs((r.getAs[Long]("kappa_p1_micro") / 1e6 - 1) - kappa) < 2e-6)
    // all four cells populated on the testdata (non-degenerate audit)
    assert(Seq(tt, tf, ft, ff).forall(_ > 0))
  }

  test("q305: TVD matches a driver brute force over the full vocabulary") {
    val toks = Tables.documents(spark, sf0001)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).toLowerCase
        // Spark/DuckDB trim() strips ONLY spaces — Scala's String.trim
        // also eats \n/\t and would drop edge empty-string tokens
        .replaceAll("^ +", "").replaceAll(" +$", "")
        .split("[ \\t\\n\\f\\r]+", -1).map(r.getString(0) -> _))
    val bySrc = toks.groupBy(_._1).map { case (s, xs) =>
      s -> xs.groupBy(_._2).map { case (t, ys) => t -> ys.length.toLong } }
    val corpus = toks.groupBy(_._2).map { case (t, ys) => t -> ys.length.toLong }
    val nn = toks.length.toLong
    val got = run("q305_source_token_tvd").collect().map(r =>
      r.getString(0) -> (r.getAs[Long]("n_tok"), r.getAs[Long]("n_types"),
        r.getAs[Long]("tvd_micro"))).toMap
    bySrc.foreach { case (s, cnt) =>
      val nS = cnt.values.sum
      // iterator, NOT corpus.keys.map — a Set.map would dedup equal
      // |difference| terms and silently undercount the sum
      val tvd = corpus.iterator.map { case (t, c) =>
        math.abs(cnt.getOrElse(t, 0L).toDouble / nS - c.toDouble / nn)
      }.sum / 2
      val (gN, gT, gV) = got(s)
      assert(gN == nS && gT == cnt.size.toLong, s"source $s totals")
      assert(math.abs(gV / 1e6 - tvd) < 2e-6, s"source $s tvd $gV vs $tvd")
    }
    assert(got.keySet == bySrc.keySet)
  }

  test("q306: vocab-truncation coverage matches a driver ranked brute force") {
    val texts = Tables.documents(spark, sf0001)
      .select(col("text")).collect().map(_.getString(0))
    val counts = texts.flatMap(t => t
      .replaceAll("^ +", "").replaceAll(" +$", "")
      .split("[ \\t\\n\\f\\r]+", -1))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val total = counts.values.sum
    val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }
    val got = run("q306_vocab_truncation").collect().map(r =>
      r.getAs[Int]("k") -> (r.getAs[Long]("kept_types"),
        r.getAs[Long]("covered_tok"), r.getAs[Long]("oov_tok"),
        r.getAs[Long]("coverage_micro"))).toMap
    Seq(100, 1000, 10000).foreach { k =>
      val covered = ranked.take(k).map(_._2).sum
      val want = (math.min(k.toLong, counts.size.toLong), covered,
        total - covered, covered * 1000000L / total)
      assert(got(k) == want, s"k=$k: ${got(k)} vs $want")
    }
    assert(got.keySet == Set(100, 1000, 10000))
    // coverage must be monotone nondecreasing in k and end below 1e6
    // only if types remain outside the cutoff
    val cov = Seq(100, 1000, 10000).map(k => got(k)._4)
    assert(cov == cov.sorted)
  }

  test("q307: packing forecast matches per-doc driver arithmetic") {
    val ntoks = Tables.documents(spark, sf0001)
      .select(col("text")).collect().map(r => r.getString(0)
        // space-only trim, matching Spark/DuckDB trim() (see q305 note)
        .replaceAll("^ +", "").replaceAll(" +$", "")
        .split("[ \\t\\n\\f\\r]+", -1).length.toLong)
    val got = run("q307_packing_forecast").collect().map(r =>
      r.getAs[Int]("l") -> (r.getAs[Long]("n_docs"), r.getAs[Long]("tok_total"),
        r.getAs[Long]("tok_trunc"), r.getAs[Long]("pad_tok"),
        r.getAs[Long]("trunc_docs"), r.getAs[Long]("packed_seqs_lb"),
        r.getAs[Long]("naive_util_micro"),
        r.getAs[Long]("trunc_share_micro"))).toMap
    Seq(128, 512, 2048).foreach { l =>
      val nd = ntoks.length.toLong
      val tot = ntoks.sum
      val trunc = ntoks.map(n => math.max(0L, n - l)).sum
      val pad = ntoks.map(n => math.max(0L, l - n)).sum
      val td = ntoks.count(_ > l).toLong
      val want = (nd, tot, trunc, pad, td, (tot + l - 1) / l,
        (tot - trunc) * 1000000L / (nd * l), trunc * 1000000L / tot)
      assert(got(l) == want, s"L=$l: ${got(l)} vs $want")
    }
    // identity: kept + trunc == total, and kept + pad == n_docs * L
    got.foreach { case (l, (nd, tot, trunc, pad, _, _, _, _)) =>
      assert(tot - trunc + pad == nd * l, s"L=$l pad/trunc identity")
    }
  }

  test("q308: dup-gram mass matches a driver 8-gram occurrence count") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)
        .replaceAll("^ +", "").replaceAll(" +$", "")
        .toLowerCase.split("[ \\t\\n\\f\\r]+", -1)))
    val occ = docs.flatMap { case (src, w) =>
      if (w.length < 8) Seq.empty
      else (0 to w.length - 8).map(i => (src, w.slice(i, i + 8).mkString(" ")))
    }
    val total = occ.groupBy(_._2).map { case (g, xs) => g -> xs.length.toLong }
    val want = occ.groupBy(_._1).map { case (src, xs) =>
      val n = xs.length.toLong
      val nd = xs.map(_._2).distinct.length.toLong
      val dup = xs.count(x => total(x._2) > 1).toLong
      src -> (n, nd, dup, dup * 1000000L / n)
    }
    val got = run("q308_ngram_dup_mass").collect().map(r =>
      r.getString(0) -> (r.getAs[Long]("n_grams"), r.getAs[Long]("n_distinct"),
        r.getAs[Long]("dup_mass"), r.getAs[Long]("dup_share_micro"))).toMap
    assert(got == want)
    // non-degenerate: the corpus must actually contain duplicated grams
    assert(got.values.exists(_._3 > 0), "no duplicate 8-grams at sf0.001")
  }

  test("q309: funnel matches a per-doc driver recompute; first-fail partitions") {
    val sig = Tables.documents(spark, sf0001)
      .select(col("text")).collect().map { r =>
        val w = r.getString(0).replaceAll("^ +", "").replaceAll(" +$", "")
          .toLowerCase.split("[ \\t\\n\\f\\r]+", -1)
        (w.length.toLong, w.distinct.length.toLong,
          w.count(stopEn.contains).toLong)
      }
    def ff(nt: Long, nd: Long, sh: Long): Int =
      if (nt < 20) 1 else if (sh * 100 < nt * 3) 2
      else if (nd * 100 < nt * 33) 3 else if (nt > 90) 4 else 0
    val n = sig.length.toLong
    val ffc = sig.groupBy { case (nt, nd, sh) => ff(nt, nd, sh) }
      .map { case (k, xs) => k -> xs.length.toLong }.withDefaultValue(0L)
    val fa = Map(
      1 -> sig.count(_._1 < 20).toLong,
      2 -> sig.count(s => s._3 * 100 < s._1 * 3).toLong,
      3 -> sig.count(s => s._2 * 100 < s._1 * 33).toLong,
      4 -> sig.count(_._1 > 90).toLong)
    val rows = run("q309_quality_funnel").collect()
    assert(rows.map(_.getAs[String]("rule")).toSeq ==
      Seq("too_short", "low_stopword", "high_repetition", "too_long"))
    rows.foreach { r =>
      val k = r.getAs[Int]("k")
      assert(r.getAs[Long]("n_fail_first") == ffc(k), s"rule $k first-fail")
      assert(r.getAs[Long]("n_fail_any") == fa(k), s"rule $k fail-any")
      assert(r.getAs[Long]("survivors_after") ==
        n - (1 to k).map(ffc).sum, s"rule $k survivors")
      assert(r.getAs[Long]("drop_share_micro") == ffc(k) * 1000000L / n)
    }
    // first-fail attribution PARTITIONS the drops: stage counts sum to
    // total drops, and the last survivors figure is the kept count
    assert(rows.map(_.getAs[Long]("n_fail_first")).sum == n - ffc(0))
    assert(rows.last.getAs[Long]("survivors_after") == ffc(0))
    // threshold non-degeneracy: every rule CATCHES something alone
    // (fail-any), and the ordered funnel has multiple live stages — the
    // last rule may legitimately never fire FIRST if every long doc also
    // trips an earlier rule (observed at sf0.001: ffc(4)=0, fa(4)>0)
    assert((1 to 4).forall(fa(_) > 0), s"degenerate rule (fail-any) in $fa")
    assert((1 to 3).forall(ffc(_) > 0), s"degenerate first-fail in $ffc")
  }

  test("q311: shard masses match a driver md5-prefix rollup at all three S") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val dm = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect().map { r =>
        (md5hex(r.getLong(0).toString).take(3),
          r.getString(1).replaceAll("^ +", "").replaceAll(" +$", "")
            .split("[ \\t\\n\\f\\r]+", -1).length.toLong)
      }
    val total = dm.map(_._2).sum
    val want = Seq(16 -> 1, 256 -> 2, 4096 -> 3).map { case (ns, p) =>
      val m = dm.groupBy(_._1.take(p)).map { case (_, xs) => xs.map(_._2).sum }
      ns.toLong -> (m.size.toLong, m.max, m.min, total,
        (BigInt(m.max) * ns * 1000000 / total).toLong)
    }.toMap
    val got = run("q311_shard_skew").collect().map(r =>
      r.getAs[Long]("n_shards") -> (r.getAs[Long]("n_used"),
        r.getAs[Long]("max_mass"), r.getAs[Long]("min_mass"),
        r.getAs[Long]("total_mass"), r.getAs[Long]("imbalance_micro"))).toMap
    assert(got == want)
    // finer sharding can only grow imbalance (a max-mass shard splits into
    // pieces whose max · S is at least the parent's max · S/“16ths”)
    val imb = Seq(16L, 256L, 4096L).map(got(_)._5)
    assert(imb.forall(_ >= 1000000L), "imbalance below the perfect floor")
  }

  test("q312: Good-Turing counts match a driver per-source tally") {
    val toksBySrc = Tables.documents(spark, sf0001)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1)
        .replaceAll("^ +", "").replaceAll(" +$", "").toLowerCase
        .split("[ \\t\\n\\f\\r]+", -1).map(r.getString(0) -> _))
      .groupBy(_._1)
    val want = toksBySrc.map { case (src, xs) =>
      val cnt = xs.groupBy(_._2).map { case (_, ys) => ys.length.toLong }
      val n = xs.length.toLong
      val n1 = cnt.count(_ == 1L).toLong
      src -> (n, cnt.size.toLong, n1, cnt.count(_ == 2L).toLong,
        n1 * 1000000L / n, n1 * 1000000L / cnt.size)
    }
    val got = run("q312_good_turing").collect().map(r =>
      r.getString(0) -> (r.getAs[Long]("n_tok"), r.getAs[Long]("n_types"),
        r.getAs[Long]("n1"), r.getAs[Long]("n2"),
        r.getAs[Long]("unseen_mass_micro"),
        r.getAs[Long]("hapax_share_micro"))).toMap
    assert(got == want)
    assert(got.values.exists(_._3 > 0), "no hapax tokens at sf0.001")
  }

  test("q313: salt plan matches a driver per-key ceil-division sweep") {
    val cnt = Tables.lineitem(spark, sf0001)
      .select(col("l_suppkey")).collect().map(_.getLong(0))
      .groupBy(identity).map { case (_, xs) => xs.length.toLong }.toSeq
    val rows = cnt.sum
    val got = run("q313_salt_plan").collect().map(r =>
      r.getAs[Int]("t_target") -> (r.getAs[Long]("n_keys"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("n_virtual"),
        r.getAs[Long]("max_factor"), r.getAs[Long]("expand_micro"),
        r.getAs[Long]("top_key_share_micro"))).toMap
    Seq(100, 250, 1000).foreach { t =>
      val nv = cnt.map(c => (c + t - 1) / t).sum
      val want = (cnt.size.toLong, rows, nv,
        cnt.map(c => (c + t - 1) / t).max,
        nv * 1000000L / cnt.size, cnt.max * 1000000L / rows)
      assert(got(t) == want, s"T=$t: ${got(t)} vs $want")
    }
    // the plan must be non-degenerate at the tight target: some key salts
    assert(got(100)._4 > 1, "T=100 produced no salting at sf0.001")
    // and virtual partitions shrink monotonically as T loosens
    val nvs = Seq(100, 250, 1000).map(got(_)._3)
    assert(nvs == nvs.sorted.reverse, s"n_virtual not monotone: $nvs")
  }

  test("q300: strict acceptance skips the li == avail tie (avail {2,2,10}, budget 8)") {
    // The first scan index has li = 8 div 3 = 2 == avail exactly — the tie
    // where a non-strict rule would stop at level 2 (alloc 6 of 8). Cell 1
    // is itself exhausted there, so the scan must continue: the true
    // maximum level is 4 (alloc 2 + 2 + 4 = 8).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q300-tie").toString
    Seq((1L, "w1 w2", "en", "srcA"),
        (2L, "w1 w2", "en", "srcB"),
        (3L, "a b c d e f g h i j", "en", "srcC"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Training.queries.find(_.name == "q300_mixture_waterfill").get
      .fn(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("avail_tok"),
        r.getAs[Long]("alloc_tok"), r.getAs[Boolean]("exhausted"))).toMap
    assert(got == Map("srcA" -> ((2L, 2L, true)),
      "srcB" -> ((2L, 2L, true)), "srcC" -> ((10L, 4L, false))))
  }
}
