package graft

import graft.functions.JaroWinklerSim
import graft.functions.JaroWinklerSim.jaroWinkler
import org.apache.spark.sql.functions._

/** graft.functions.JaroWinklerSim: the kernel is pinned to the classic
  * Jaro (1989) / Winkler (1990) algorithm with the exact conventions the
  * q216 oracle engine (DuckDB's jaro_winkler_similarity, rapidfuzz-derived)
  * uses — every expected value below was probed against that engine:
  * empty → 0.0, match window ⌊max/2⌋−1 floored at 0, transpositions
  * floored (t = ⌊k/2⌋ even for odd k), boost only above 0.7, prefix ≤ 4.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double = JaroWinklerSim.similarity(a, b)
  private def near(x: Double, y: Double) = assert(math.abs(x - y) < 1e-12, s"$x vs $y")

  test("published record-linkage values (probed against the oracle engine)") {
    near(jw("MARTHA", "MARHTA"), 0.9611111111111111)
    near(jw("DWAYNE", "DUANE"), 0.8400000000000001)
    near(jw("DIXON", "DICKSONX"), 0.8133333333333332)
    near(jw("JELLYFISH", "SMELLYFISH"), 0.8962962962962964)
  }

  test("empty-string convention: any empty side (including both) scores 0") {
    assert(jw("", "") == 0.0)
    assert(jw("", "a") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("a", "a") == 1.0)
  }

  test("boost applies only above 0.7, with prefix capped at 4") {
    near(jw("ABCDEF", "ABCXYZ"), 0.6666666666666666) // j ≤ 0.7 → no boost
    near(jw("abcdwxyz", "abcdzzzz"), 0.85)           // j=0.75, l=4 → 0.85
    near(jw("aaaa", "aaaazzzzzzzzzzzz"), 0.85)       // l capped at 4
    near(jw("CRATE", "TRACE"), 0.7333333333333334)   // boost active, l=0
  }

  test("window floor at 0 and FLOORED transpositions (odd k rounds down)") {
    assert(jw("ABC", "BCA") == 0.0)                  // window 0 → no matches
    near(jw("ACB", "BCA"), 0.5555555555555555)       // window 0, only C aligns
    // matched sequences ABC vs BCA → k=3 mismatches, t=⌊3/2⌋=1 (a half-
    // transposition convention t=1.5 would give 0.5 — the engines floor)
    near(jw("ABCxyz", "BCAqrs"), 0.5555555555555555)
  }

  test("codegen and interpreted paths agree on a corpus slice") {
    val names = Tables.part(spark, sf0001).select(col("p_name")).limit(200)
    val scored = names
      .withColumn("q", translate(col("p_name"), "aeiou", ""))
      .withColumn("sim", jaroWinkler(col("q"), col("p_name")))
      .collect()
    scored.foreach { r =>
      val expected = JaroWinklerSim.similarity(r.getString(1), r.getString(0))
      assert(r.getDouble(2) == expected,
        s"codegen vs kernel mismatch on ${r.getString(0)}")
    }
    // sanity: vowel-stripping keeps names similar but not identical
    assert(scored.forall(r => r.getDouble(2) > 0.5))
  }

  test("null inputs yield null") {
    val df = Seq((Option("abc"), Option.empty[String])).toDF("a", "b")
    assert(df.select(jaroWinkler(col("a"), col("b"))).head().isNullAt(0))
  }
}
