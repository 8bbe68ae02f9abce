package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column as one native expression:
  * `string` → `array<string>`, computed map-side. Replaces the
  * explode(sequence) + getItem×n + concat_ws + global distinct() pipeline:
  * the per-doc dedup happens inside the expression, so the downstream
  * `select(doc_id, explode(shingles))` needs NO distinct shuffle at all —
  * one less wide exchange in every dedup family that shingles feeds
  * (exact Jaccard, MinHash-LSH, SimHash).
  *
  * Tokenization replicates TextOps.tokens exactly — space-only trim
  * (Spark/DuckDB `trim` semantics, NOT Java's control-character trim),
  * UTF8String lowercasing, and a split on the explicit class [ \t\n\f\r]
  * (the house convention — shorthand \s differs between Java, old RE2 and
  * new RE2 on vertical tab, so every oracle spells the same explicit
  * class) — so shingle strings stay bit-identical to the DuckDB oracle's
  * on any input.
  * Fewer than n tokens → empty array (the SQL filter `size(w) >= n`).
  * First-occurrence order, deterministic.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  def computeShingles(text: UTF8String): ArrayData = {
    val toks = text.trim().toLowerCase().toString.split("[ \t\n\f\r]+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = computeShingles(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeShingles($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles {
  /** Column form: distinct word n-gram shingles of a text column. */
  def wordShingles(text: Column, n: Int): Column =
    GraftSql.column(WordShingles(GraftSql.expression(text), n))
}
