package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as one native Catalyst expression:
  * `(string, string) → double` in [0, 1].
  *
  * Why a custom expression (SURVEY.md §2.7 extension surface): Spark ships
  * `levenshtein` but no Jaro-Winkler, and fuzzy entity reconciliation
  * (matching corrupted catalog names back to the canonical catalog, q216)
  * wants the prefix-weighted measure record-linkage literature standardized
  * on (Winkler 1990, building on Jaro 1989). A Scala UDF would box both
  * strings and break whole-stage codegen; this expression stays inside
  * codegen — `doGenCode` emits a call to the same static kernel
  * `nullSafeEval` uses, so the corpus side of a reconciliation join scans
  * without allocation beyond the two O(len) match-flag arrays.
  *
  * Exact semantics (pinned to the classic algorithm; verified in
  * JaroWinklerSpec against published values and, through the q216 oracle,
  * against DuckDB's `jaro_winkler_similarity` over the whole catalog):
  *  - either side empty → 0.0 (the record-linkage convention DuckDB uses;
  *    note "" vs "" is 0.0, not 1.0);
  *  - match window = ⌊max(|a|,|b|)/2⌋ − 1, floored at 0;
  *  - transpositions t = ⌊k/2⌋ where k counts order mismatches between the
  *    two matched-character sequences (integer floor — an odd k rounds
  *    DOWN, probed explicitly against the oracle engine);
  *  - jaro = (m/|a| + m/|b| + (m−t)/m) / 3, 0.0 when m = 0;
  *  - Winkler boost only above 0.7: jw = j + ℓ·0.1·(1−j), common prefix
  *    ℓ capped at 4.
  * Comparison is per UTF-16 code unit — identical to DuckDB's per-code-unit
  * comparison on ASCII corpora like the catalog names; supplementary-plane
  * text would diverge engine-to-engine and is out of scope for q216.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSim.similarity(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = JaroWinklerSim.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $kernel.similarity($a.toString(), $b.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {

  /** Static kernel shared by interpreted eval and generated code. */
  def similarity(a: String, b: String): Double = {
    val n1 = a.length
    val n2 = b.length
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val f1 = new Array[Boolean](n1)
    val f2 = new Array[Boolean](n2)
    var m = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!f2(j) && a.charAt(i) == b.charAt(j)) {
          f1(i) = true; f2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // order mismatches between the two matched-character sequences
    var k = 0
    var j = 0
    i = 0
    while (i < n1) {
      if (f1(i)) {
        while (!f2(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) k += 1
        j += 1
      }
      i += 1
    }
    val t = k / 2 // integer floor — see the class doc
    val jaro = (m.toDouble / n1 + m.toDouble / n2 + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(n1, n2))
    while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Column-API entry point. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftSql.column(JaroWinklerSim(GraftSql.expression(a), GraftSql.expression(b)))
}
