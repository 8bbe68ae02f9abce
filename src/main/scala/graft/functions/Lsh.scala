package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Banded random-hyperplane LSH signature as one native Catalyst expression:
  * input `array<float|double>` → `array<long>` of `bands` bucket hashes,
  * each packing `bits` hyperplane sign bits. Two vectors at angle θ agree on
  * a bit with probability 1 − θ/π; a band matches with that to the
  * `bits`-th power, and `bands` independent chances keep recall high while
  * buckets stay selective (tune bits up for near-dup thresholds ≥ 0.9,
  * down toward 4–6 for mid thresholds like 0.5).
  *
  * Why one expression instead of `bands × bits` column formulas: the
  * signature is consumed on both sides of the bucket self-join, and a
  * 96-subexpression projection gets re-codegen'd (seconds of Janino time)
  * for every plan fragment that references it. Here the whole kernel is a
  * single reference-object method call inside whole-stage codegen — compact
  * generated code, planes computed once per plan, no per-row allocation
  * beyond the output array.
  *
  * Planes are deterministic (splitmix64 of plane-id × dim-index): no RNG
  * state, identical signatures on every executor of a 1000-node cluster.
  */
case class HyperplaneBands(child: Expression, bands: Int, bits: Int, dim: Int)
    extends UnaryExpression {

  require(bits <= 62, "bits must fit a long")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${other.sql}")
  }

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Parquet list columns arrive containsNull=true even when no element is
    * ever null; a null element yields a null signature (propagated, not
    * silently read as garbage). */
  @transient private lazy val elementsNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean = super.nullable || elementsNullable

  /** planes(p)(i): component i of hyperplane p, uniform in [-1, 1). */
  @transient lazy val planes: Array[Array[Double]] =
    Array.tabulate(bands * bits)(Lsh.planeVector(_, dim))

  /** Returns null if a consumed element is null (caller propagates). */
  def computeBands(x: ArrayData): ArrayData = {
    val n = math.min(dim, x.numElements())
    if (elementsNullable) {
      var i = 0
      while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0L
      var j = 0
      while (j < bits) {
        val p = planes(b * bits + j)
        var s = 0.0
        var i = 0
        while (i < n) {
          s += p(i) * (if (isFloat) x.getFloat(i).toDouble else x.getDouble(i))
          i += 1
        }
        if (s >= 0) h |= (1L << j)
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = computeBands(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hpb", this, classOf[HyperplaneBands].getName)
    // the isNull store only exists when the schema allows null elements —
    // otherwise ev.isNull is the literal `false` (not assignable)
    val nullStore =
      if (elementsNullable) s"${ev.isNull} = ${ev.value} == null;" else ""
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = (${classOf[ArrayData].getName}) $ref.computeBands($c);
         |$nullStore""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Lsh {

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Plane `planeId` as a dense vector with components uniform in [-1, 1). */
  def planeVector(planeId: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      val h = splitmix64(planeId.toLong * 1000003L + i)
      (h >>> 11) * (2.0 / (1L << 53)) - 1.0
    }

  /** Column form: `array<long>` of banded hyperplane bucket hashes. */
  def hyperplaneBands(emb: Column, bands: Int, bits: Int, dim: Int): Column =
    GraftSql.column(HyperplaneBands(GraftSql.expression(emb), bands, bits, dim))
}
