package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Training-corpus assembly operators (SURVEY.md §2 extension surface) —
  * the three planning steps that sit between a curated corpus and a
  * training run: preference-pair mining (the DPO/RLHF chosen-vs-rejected
  * construction over per-prompt scored candidates), token-budget corpus
  * selection (greedy quality-ranked selection under a global token
  * budget), and mixture water-filling (allocating a token budget across
  * sources with per-source availability caps — the level-set allocation
  * behind mixture weights that can't over-draw a small source).
  * Reference analogue: the reference's train/test assembly stage
  * (/root/reference/Scripts/model.py randomSplit + feature selection)
  * generalized to corpus-level budget planning.
  *
  * Scale shapes (100 TB): q298 is ONE user-keyed shuffle with map-side
  * partial struct-max/min aggregation (no window, no join); q299 reduces
  * the corpus to (doc_id, lang, ntok, score) map-side, then runs the
  * q130 block-offset topology for the global running token sum — the
  * only SinglePartition carries ≤32 block totals; q300 reduces the
  * corpus to ≤|sources| rows with one partial-aggregated scan and does
  * all level arithmetic on that broadcast-sized frame. Cross-engine
  * float discipline: scores, budgets, levels, and allocations are all
  * integer-valued (milli-scores, token counts) — the only division is
  * exact integer floor division on nonnegative operands, identical in
  * both engines; no floats cross the engine boundary at all.
  */
object Training {

  /** Lowercased whitespace tokens — the q28/q29/q135 house convention. */
  private def toks(c: Column): Column =
    split(trim(lower(c)), "[ \\t\\n\\f\\r]+")

  /** English stopword heads (the q28 lang-id "en" list): the density
    * signal q299 ranks by — natural running text hits these constantly,
    * boilerplate/code/noise barely at all. */
  private val stopEn = Seq("the", "a", "and", "of", "to", "in", "is")

  private def stopHits(t: Column): Column =
    size(filter(t, x => array_contains(array(stopEn.map(lit): _*), x)))

  /** DuckDB spellings of the same tokenize + stopword hit count. */
  private val duckToks = "string_split_regex(trim(lower(text)), '\\s+')"
  private val duckStopList =
    stopEn.map(w => s"'$w'").mkString("[", ", ", "]")

  val queries: Seq[Q] = Seq(

    // Preference-pair mining — the DPO/RLHF construction: treat each
    // user's scored events as candidate responses to one prompt and emit
    // the (chosen, rejected) pair with the widest reward margin, keeping
    // only pairs whose margin clears a threshold (weak preferences teach
    // nothing). Scores enter as exact integer cents (the q296 rounding
    // channel, proven cross-engine), so extreme selection and the margin
    // are pure integer work. Tie-breaks are total: equal-score candidates
    // resolve to the SMALLEST event_id on both ends, via lexicographic
    // struct extremes — max(struct(c, −id)) / min(struct(c, id)) — which
    // aggregate with map-side partial combine. ONE user-keyed exchange,
    // no window, no self-join: at 100 TB this is a single shuffle whose
    // reduce side holds |users| structs, and the pair table it emits is
    // exactly the training artifact a preference-tuning run consumes.
    Q("q298_preference_pairs",
      """WITH e AS (
        |  SELECT user_id, event_id,
        |         CAST(round(value * 100, 0) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |s AS (
        |  SELECT user_id, max(c) AS mx, min(c) AS mn, count(*) AS n
        |  FROM e GROUP BY 1),
        |ch AS (
        |  SELECT e.user_id, min(e.event_id) AS chosen_id
        |  FROM e JOIN s ON e.user_id = s.user_id AND e.c = s.mx
        |  GROUP BY 1),
        |rj AS (
        |  SELECT e.user_id, min(e.event_id) AS rejected_id
        |  FROM e JOIN s ON e.user_id = s.user_id AND e.c = s.mn
        |  GROUP BY 1)
        |SELECT s.user_id, ch.chosen_id, rj.rejected_id,
        |       s.mx AS chosen_cents, s.mn AS rejected_cents,
        |       s.mx - s.mn AS margin_cents
        |FROM s
        |JOIN ch ON s.user_id = ch.user_id
        |JOIN rj ON s.user_id = rj.user_id
        |WHERE s.n >= 2 AND s.mx - s.mn >= 20000
        |ORDER BY 1""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("user_id"), col("event_id"),
          round(col("value") * 100, 0).cast("long").as("c"))
      e.groupBy("user_id")
        .agg(
          max(struct(col("c"), (-col("event_id")).as("nid"))).as("hi"),
          min(struct(col("c"), col("event_id"))).as("lo"),
          count(lit(1)).as("n"))
        .filter(col("n") >= 2 && col("hi.c") - col("lo.c") >= 20000)
        .select(col("user_id"),
          (-col("hi.nid")).as("chosen_id"),
          col("lo.event_id").as("rejected_id"),
          col("hi.c").as("chosen_cents"),
          col("lo.c").as("rejected_cents"),
          (col("hi.c") - col("lo.c")).as("margin_cents"))
        .orderBy(col("user_id"))
    },

    // Token-budget corpus selection — rank every document by an integer
    // quality score (stopword hits per mille of tokens: running prose
    // scores high, noise scores 0) and take the greedy prefix whose
    // cumulative token count fits a global budget of half the corpus.
    // ntok ≥ 1 always (split of "" is [""]), so the running sum is
    // strictly increasing and "cum ≤ budget" IS a prefix — the classic
    // budgeted-selection semantics. The global running sum runs in the
    // q130 block-offset topology ([[Ranks.globalCumSum]]): the corpus is
    // reduced map-side to 4 small columns, range-partitioned on the
    // (score desc, doc_id) total order, prefix-summed per block in
    // parallel, and stitched with a broadcast ≤32-row block-total table —
    // no single-task global sort at any size. Output is the per-language
    // selection profile (what a mixture report reads), ≤|langs| rows.
    Q("q299_token_budget_select",
      s"""WITH sc AS (
        |  SELECT doc_id, lang, len(w) AS ntok,
        |         (len(list_filter(w, x -> list_contains($duckStopList, x)))
        |          * 1000) // len(w) AS score_milli
        |  FROM (SELECT doc_id, lang, $duckToks AS w FROM documents)),
        |b AS (SELECT sum(ntok) // 2 AS budget FROM sc),
        |c AS (
        |  SELECT lang, ntok,
        |         sum(ntok) OVER (ORDER BY score_milli DESC, doc_id) AS cum
        |  FROM sc)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_sel,
        |       CAST(sum(ntok) AS BIGINT) AS tok_sel
        |FROM c, b WHERE cum <= budget
        |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val t = toks(col("text"))
      val sc = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), size(t).cast("long").as("ntok"),
          Ranks.intDiv(stopHits(t) * 1000, size(t)).as("score_milli"))
      val budget = sc.agg(Ranks.intDiv(sum(col("ntok")), lit(2)).as("budget"))
      Ranks.globalCumSum(sc, 32, col("ntok"),
          col("score_milli").desc, col("doc_id"))
        .crossJoin(broadcast(budget))
        .filter(col("cum") <= col("budget"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sel"), sum(col("ntok")).as("tok_sel"))
        .orderBy(col("lang"))
    },

    // Mixture water-filling — allocate a token budget (60% of the corpus)
    // across (source, lang) domains, each capped at its available token
    // count: every domain gets min(avail, L) where L is the LARGEST
    // integer level that fits the budget — the level-set allocation
    // behind mixture planning that can't over-draw a small domain (small
    // cells are consumed whole, the level rises to spend the remainder on
    // big ones). L comes from the standard sorted-availability scan: with
    // cells ordered by (avail, source, lang) and pre_i the exclusive
    // prefix sum, the first index where L_i = (budget − pre_i) div
    // (m − i + 1) fits under avail_i yields L = L_i (TrainingSpec
    // brute-forces max{L : Σ min(avail, L) ≤ budget} to pin optimality).
    // The corpus reduces to ≤|sources|·|langs| rows in one
    // partial-aggregated scan; every window and join after that runs on
    // that broadcast-sized frame (PlanQualitySpec's global-window sweep
    // sees only post-aggregation frames here). All arithmetic is BIGINT
    // on nonnegative operands — identical floor division in both
    // engines; at 100 TB the only corpus-touching work is the one scan.
    Q("q300_mixture_waterfill",
      """WITH t AS (
        |  SELECT source, lang,
        |         len(string_split_regex(trim(lower(text)), '\s+')) AS ntok
        |  FROM documents),
        |d AS (SELECT source, lang, CAST(sum(ntok) AS BIGINT) AS avail
        |      FROM t GROUP BY 1, 2),
        |g AS (SELECT count(*) AS m, (sum(avail) * 3) // 5 AS budget FROM d),
        |o AS (
        |  SELECT source, lang, avail,
        |         row_number() OVER (ORDER BY avail, source, lang) AS i,
        |         coalesce(sum(avail) OVER (
        |           ORDER BY avail, source, lang
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS pre
        |  FROM d),
        |cand AS (
        |  SELECT i, (budget - pre) // (m - i + 1) AS li
        |  FROM o, g
        |  WHERE (budget - pre) // (m - i + 1) BETWEEN 0 AND avail),
        |lvl AS (SELECT li AS level FROM cand ORDER BY i LIMIT 1)
        |SELECT source, lang, avail AS avail_tok,
        |       least(avail, level) AS alloc_tok,
        |       avail <= level AS exhausted
        |FROM o, lvl ORDER BY source, lang""".stripMargin) { (s, d) =>
      val av = Tables.documents(s, d)
        .select(col("source"), col("lang"),
          size(toks(col("text"))).cast("long").as("ntok"))
        .groupBy(col("source"), col("lang")).agg(sum(col("ntok")).as("avail"))
      val g = av.agg(count(lit(1)).as("m"),
        Ranks.intDiv(sum(col("avail")) * 3, lit(5)).as("budget"))
      val w = Window.orderBy(col("avail"), col("source"), col("lang"))
      val o = av
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("pre", coalesce(
          sum(col("avail")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .crossJoin(broadcast(g))
      val li = Ranks.intDiv(col("budget") - col("pre"),
        col("m") - col("i") + 1)
      val lvl = o.withColumn("li", li)
        .filter(col("li") >= 0 && col("li") <= col("avail"))
        .orderBy(col("i")).limit(1)
        .select(col("li").as("level"))
      o.crossJoin(broadcast(lvl))
        .select(col("source"), col("lang"), col("avail").as("avail_tok"),
          least(col("avail"), col("level")).as("alloc_tok"),
          (col("avail") <= col("level")).as("exhausted"))
        .orderBy(col("source"), col("lang"))
    }
  )
}
