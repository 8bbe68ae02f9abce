package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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
        val bytes = arr.getUTF8String(t).getBytes
        var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
        var i = 0
        while (i < bytes.length) {
          h ^= (bytes(i) & 0xffL)
          h *= 0x100000001b3L
          i += 1
        }
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

object TextHash {
  /** Column form: 64-bit SimHash of an `array<string>` token column. */
  def simhash64(tokens: Column): Column =
    GraftSql.column(SimHash64(GraftSql.expression(tokens)))
}
