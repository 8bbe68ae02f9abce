package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values as a pure Column composition — no custom
  * expression needed: the bit spread/interleave unrolls to shift/and/or
  * terms that whole-stage codegen compiles into one flat Java method.
  *
  * Interleaving the low `bits` of two dimensions makes lexicographic order
  * on the z-value visit the (a, b) grid in nested Z's, so ANY contiguous
  * z-range maps to a small bounding box in BOTH dimensions — the property
  * that gives every output file tight min/max stats on both columns at
  * once (single-column sorting, q89, only bounds its own column). This is
  * the clustering Delta/Iceberg `OPTIMIZE ZORDER BY` applies to 100 TB
  * fact tables with two common filter dimensions.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `a` (odd positions) and `b` (even
    * positions) into a single non-negative long. Inputs must be
    * non-negative; callers rescale/offset first. */
  def zvalue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in 1..31")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }
    terms.reduce(_.bitwiseOR(_))
  }
}
