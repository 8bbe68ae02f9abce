package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.BpeOps

/** [[graft.functions.BpeSymbolSum]] — the codegen'd BPE encode kernel
  * behind q155. The load-bearing contract is VALUE IDENTITY with the
  * composed-HOF form it replaced (space-wrapped encode → one replace per
  * rule → split and count): the q155 oracle replays that exact chain in
  * DuckDB, so any divergence — unicode splitting, merge order, chaining,
  * null poisoning — is a FULL-hash board failure. */
class BpeOpsSpec extends SparkSpec {

  /** The pre-round-17 HOF formula, verbatim (Profiling q155's old body). */
  private def hofSymbolSum(tk: Column,
      rules: Seq[(String, String)]): Column = {
    def encoded(t: Column) = concat(lit(" "),
      array_join(filter(split(t, ""), c => c =!= ""), "  "), lit(" "))
    def symbols(t: Column) = size(split(trim(
      rules.foldLeft(encoded(t)) { case (acc, (a, b)) =>
        replace(acc, lit(s" $a  $b "), lit(s" $a$b "))
      }), "  "))
    aggregate(transform(tk, symbols _), lit(0L), (acc, x) => acc + x)
  }

  private def bothWays(tokens: Seq[Seq[String]],
      rules: Seq[(String, String)]): Unit = {
    import spark.implicits._
    val df = tokens.toDF("tk")
    val rows = df.select(
      BpeOps.symbolSum(col("tk"), rules).as("kernel"),
      hofSymbolSum(col("tk"), rules).as("hof")).collect()
    rows.zip(tokens).foreach { case (r, in) =>
      assert(!r.isNullAt(0) && !r.isNullAt(1),
        s"unexpected null for input $in")
      assert(r.getLong(0) == r.getLong(1),
        s"kernel=${r.getLong(0)} hof=${r.getLong(1)} for input $in " +
          s"under rules $rules")
    }
  }

  test("kernel equals the HOF replace chain on merge-order edge cases") {
    // chaining: ' a  a  a ' must merge the FIRST pair only per pass;
    // non-overlapping repeats merge everywhere in one pass; later rules
    // see earlier rules' output (rule 2 consumes rule 1's product)
    bothWays(
      Seq(Seq("aaa", "aaaa", "abab", "ab", "ba", "x"),
        Seq("abcabc"), Seq("bbb", "bb")),
      Seq(("a", "a"), ("a", "b"), ("ab", "c"), ("b", "b")))
    // a rule whose lhs equals another's product, applied in both orders
    bothWays(Seq(Seq("aab", "aba")),
      Seq(("a", "b"), ("a", "ab"), ("ab", "a")))
    // zero rules: symbol count == code-point count
    bothWays(Seq(Seq("hello", "a", "yz")), Seq.empty)
  }

  test("kernel equals the HOF chain on adversarial unicode") {
    // CJK (3-byte UTF-8), emoji (supplementary plane — ONE symbol per
    // code point both sides), combining marks (separate code points),
    // and merges ACROSS those classes
    bothWays(
      Seq(Seq("数据引擎", "数据", "据数"),
        Seq("🙂🙂a", "a🙂", "🙂"),
        Seq("état", "é")),
      Seq(("数", "据"), ("🙂", "🙂"), ("e", "́")))
  }

  test("kernel matches on random token arrays under the q142 rule shape") {
    // deterministic pseudo-random corpus over a small alphabet so rules
    // fire often (seeded — repeatable)
    val rnd = new scala.util.Random(42)
    val alpha = "abcd"
    val tokens = Seq.fill(200)(Seq.fill(1 + rnd.nextInt(4))(
      (0 until 1 + rnd.nextInt(12))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString))
    bothWays(tokens, Seq(("a", "b"), ("c", "d"), ("ab", "cd"),
      ("a", "a"), ("aa", "aa")))
  }

  test("null contract: null array -> NULL; null element -> NULL") {
    import spark.implicits._
    val df = Seq((1, Seq("ab", "cd")), (2, null), (3, Seq("ab", null)))
      .toDF("id", "tk")
    val rows = df.select(col("id"),
      BpeOps.symbolSum(col("tk"), Seq(("a", "b"))).as("n"))
      .orderBy("id").collect()
    assert(rows(0).getLong(1) == 3L) // [ab]=1 merged, [c,d]=2
    assert(rows(1).isNullAt(1), "null array must be NULL")
    assert(rows(2).isNullAt(1), "null element must poison the sum " +
      "(the HOF aggregate's acc + NULL)")
  }

  test("BpePairCounts aggregator equals the explode/groupBy pair counts") {
    // the q142 trainer's pair-statistics pass: the one-pass mergeable
    // aggregate must produce the identical weighted adjacent-pair counts
    // as the declarative explode form it replaced (same Σfreq per pair,
    // every occurrence counted — 'aaa' contributes (a,a) twice)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alpha = Vector("a", "b", "c", "ab", "丁", "x")
    val vocab = Seq.fill(300) {
      val syms = Seq.fill(1 + rnd.nextInt(8))(alpha(rnd.nextInt(alpha.size)))
      (" " + syms.mkString("  ") + " ", 1L + rnd.nextInt(9))
    } :+ ((" a ", 5L)) // single-symbol word: contributes nothing
    val df = vocab.toDF("s", "freq")
    val pc = udaf(new graft.functions.BpePairCounts(),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong))
    val got = df.agg(pc(col("s"), col("freq")).as("m"))
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    val bigrams = (a: Column) =>
      zip_with(slice(a, lit(1), greatest(size(a) - 1, lit(0))),
        slice(a, lit(2), greatest(size(a) - 1, lit(0))),
        (x, y) => concat_ws(" ", x, y))
    val want = df
      .select(col("freq"), split(trim(col("s")), "  ").as("a"))
      .filter(size(col("a")) > 1)
      .select(col("freq"), explode(bigrams(col("a"))).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("c"))
      .as[(String, Long)].collect().toMap
    assert(got == want, s"aggregator=${got.size} pairs, explode=${want.size}")
    assert(got.nonEmpty && got.values.forall(_ >= 1))
  }

  test("SQL registration: graft_bpe_symsum reaches the same kernel") {
    GraftExtensions.register(spark)
    val n = spark.sql(
      "SELECT graft_bpe_symsum(array('abab', 'x'), array('a', 'b')) AS n")
      .head().getLong(0)
    assert(n == 3L) // abab -> [ab, ab] = 2, x -> 1
    // non-foldable rules must be rejected at analysis, not mis-executed
    val err = intercept[Exception] {
      spark.sql("SELECT graft_bpe_symsum(array('a'), array(string(id))) " +
        "FROM range(1)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable"),
      s"unexpected analysis error: ${err.getMessage}")
  }
}
