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
}
