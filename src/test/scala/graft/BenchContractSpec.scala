package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contracts on the bench's machine-readable output line — pure registry
  * arithmetic, no SparkSession needed. The driver retains only the last
  * ~2000 chars of stdout and parses the JSON out of that tail; rounds 3
  * and 4 were recorded parsed:null because the line outgrew the window.
  * These tests make that regression impossible to reintroduce silently.
  *
  * TIMING CONVENTION (round 7, after r3/r6 both recorded VM-throttle
  * stretches inflating untouched queries 2-10×): any query whose first
  * pass exceeds 3 s is re-run once and reports the MIN of its successful
  * passes (Bench.scala `SecondPassThreshold`). Min is the right estimator
  * under additive environment noise; the re-run also absorbs first-use
  * session costs no warm-up covers (RocksDB native load, first MLlib tree
  * fit shape). Round-over-round comparisons should therefore read
  * BENCH_r07+ per-query entries as "best observed", directly comparable
  * to isolated RunOne timings — not to single-pass r1-r6 entries, which
  * mix in VM weather. */
class BenchContractSpec extends AnyFunSuite {

  test("compact bench line fits the driver's 2000-char stdout tail with headroom") {
    // Per-entry rendering "NNN":V, — bare-number key (the "q" prefix was
    // dropped in round 7; leading zeros in round 8) + quotes(2) + colon +
    // value + comma. The value rendering is BOUNDED at 3 chars (failures
    // "-1", 1 decimal below 10 s, integer 10–999 s — Bench.compactSecs),
    // so key+7 is a guaranteed worst-case bound per entry, not a
    // typical+spare estimate: even a fully throttle-inflated run cannot
    // grow the line past this sum. Since late round 8 the map carries the
    // SLOWEST ≤150 entries (the registry outgrew the all-entries bound at
    // 190); the omitted tail adds the fixed n_omitted/omitted_total keys.
    // The worst case below takes the 150 LONGEST keys — whichever queries
    // turn out slowest, their rendered entries cannot exceed that sum.
    // Header/banner calibrated against a measured round-8 line (1587
    // chars total at 159 queries; header ≤ 103 observed, banner ~75) with
    // margin. Error maps (60-char-capped messages, failure runs only) are
    // excluded — a failing bench may clip, a healthy one must not.
    val keyLens = SparkEntry.registry
      .map(_.name.takeWhile(_ != '_').stripPrefix("q").toInt.toString)
      .map(_.length + 7).sorted.reverse
    val entries = keyLens.take(150).sum +
      (if (SparkEntry.registry.size > 150)
        ""","n_omitted":NNN,"omitted_total":NNN""".length else 0)
    val header = 110 // {"metric":"total","value":NNN.NNN,...,"queries":{
    val sbtBanner = 85 // trailing "[success] Total time: ..." line
    assert(header + entries + sbtBanner <= 2000,
      s"worst-case bench line ${header + entries} chars + $sbtBanner sbt " +
        s"banner exceeds the 2000-char driver tail at " +
        s"${SparkEntry.registry.size} queries — compact the format before " +
        "adding more queries")
  }

  test("cap arithmetic survives q999 numbering at the absolute worst case") {
    // Registry-independent bound (round-9 pin): however the registry
    // grows, the machine line renders ≤150 entries, each worst-case
    // "999":VVV, = 3-digit key + quotes(2) + colon(1) + comma(1) +
    // 3-char compactSecs value = 10 chars. With the fixed omission keys,
    // header and sbt banner the ceiling stays under 1800 — comfortable
    // inside the driver's 2000-char stdout tail — so query numbering can
    // run to q999 without revisiting the format.
    val perEntry = "999".length + 7
    val entries = 150 * perEntry +
      ""","n_omitted":NNN,"omitted_total":NNNN""".length
    val header = 110
    val sbtBanner = 85
    val worst = header + entries + sbtBanner
    assert(worst < 1800,
      s"worst-case line at q999 numbering is $worst chars — compact the " +
        "format before the registry outgrows it")
  }

  test("compactSecs rendering never exceeds 3 chars on any realistic value") {
    // the values the bench can produce: positive seconds up to the 600 s
    // per-query ceiling, and negated failure markers floored at -0.1
    val candidates = Seq(0.0, 0.04, 0.1, 0.45, 9.94, 9.99, 10.0, 10.5,
      12.34, 99.9, 123.4, 599.9, 1200.0, -0.1, -0.45, -9.9, -9.99, -12.3,
      -599.9)
    candidates.foreach { v =>
      val s = Bench.compactSecs(v)
      assert(s.length <= 3, s"compactSecs($v) = '$s' exceeds 3 chars")
      assert(java.lang.Double.parseDouble(s).isFinite, s"'$s' not JSON-numeric")
      // sign survives rendering: failures must stay visibly negative
      if (v <= -0.1) assert(s.startsWith("-"), s"negated marker lost: $v -> $s")
    }
  }

  test("bench prefix keys are unique and name every registered query") {
    val prefixes = SparkEntry.registry.map(_.name.takeWhile(_ != '_'))
    assert(prefixes.distinct.size == prefixes.size)
    assert(prefixes.forall(_.matches("q[0-9]+")),
      "bench keys must stay bare qNN prefixes (compactness contract)")
  }

  test("every registered query carries a DuckDB oracle") {
    // current contract: zero rows-only queries — operators whose values
    // are not SQL-expressible use the property-boolean oracle form
    // instead of opting out. Relaxing this is a deliberate decision:
    // update this test alongside the SURVEY coverage table.
    val rowsOnly = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
    assert(rowsOnly.isEmpty,
      s"queries without oracles: $rowsOnly — every operator carries a " +
        "DuckDB oracle (property-boolean form where not SQL-expressible)")
  }
}
