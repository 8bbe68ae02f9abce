package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** 64-bit SimHash of a token array as one native Catalyst expression:
  * `array<string>` → `bigint`. Classic Charikar scheme: each token is
  * hashed (FNV-1a 64 over its UTF-8 bytes — self-contained, stable across
  * JVMs and executors), each of the 64 hash bits votes ±1, and the sign of
  * each accumulated vote becomes the output bit. Near-duplicate documents
  * differ in few tokens, so their vote sums — and therefore sign bits —
  * agree almost everywhere: Hamming distance on the output approximates
  * token-multiset distance.
  *
  * Map-only (no shuffle): per-doc fingerprints at 100 TB are a pure scan;
  * the near-dup join then works on 8-byte keys (chunked, see q44) instead
  * of document text. Null tokens vote nothing; a null array yields null.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.sql}")
  }

  def computeSimHash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = Fnv.hash64(arr.getUTF8String(t).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any = computeSimHash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeSimHash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken: "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003) as one native
  * Catalyst expression: `string` → sorted distinct `array<long>`.
  *
  * A polynomial ROLLING hash slides over the text's k-grams (one multiply +
  * one subtract per character, not a rehash per window), then winnowing
  * keeps only the minimum hash of each window of `w` consecutive k-gram
  * hashes — the classic guarantee: any shared substring of length ≥ w+k−1
  * contributes at least one shared fingerprint, while output density is
  * ~2/(w+1). Fingerprints are position-independent, so near-duplicate docs
  * share most of their (small) fingerprint sets; the candidate join works
  * on 8-byte keys. Map-only, no shuffle.
  */
case class Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {

  require(k >= 2 && w >= 2, "k-gram size and window must be >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  private val Base = 1000003L

  def computeFingerprints(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // rolling polynomial hash over all k-grams
    var pow = 1L // Base^(k-1)
    var i = 1
    while (i < k) { pow *= Base; i += 1 }
    val grams = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    grams(0) = h
    i = k
    while (i < n) {
      h = (h - (bytes(i - k) & 0xff) * pow) * Base + (bytes(i) & 0xff)
      grams(i - k + 1) = h
      i += 1
    }
    // winnow: min of each window of w gram hashes (rightmost min on ties)
    val out = scala.collection.mutable.SortedSet.empty[Long]
    if (grams.length <= w) {
      var m = grams(0); i = 1
      while (i < grams.length) { if (grams(i) <= m) m = grams(i); i += 1 }
      out += m
    } else {
      i = 0
      while (i + w <= grams.length) {
        var m = grams(i)
        var j = i + 1
        while (j < i + w) { if (grams(j) <= m) m = grams(j); j += 1 }
        out += m
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any =
    computeFingerprints(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, classOf[Winnow].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeFingerprints($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHash {
  /** Column form: 64-bit SimHash of an `array<string>` token column. */
  def simhash64(tokens: Column): Column =
    GraftSql.column(SimHash64(GraftSql.expression(tokens)))

  /** Column form: winnowing fingerprint set of a text column. */
  def winnow(text: Column, k: Int = 8, w: Int = 4): Column =
    GraftSql.column(Winnow(GraftSql.expression(text), k, w))
}
