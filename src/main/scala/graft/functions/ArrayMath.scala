package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{lit, sqrt, when}
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two numeric arrays (`array<float>` or
  * `array<double>`), accumulating in double precision in ascending index
  * order — the exact fold `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * computes, and the exact fold the DuckDB oracle's
  * `list_sum(list_transform(...))` computes, so results are bit-comparable
  * across engines.
  *
  * Why a custom expression (SURVEY.md §2.7 extension surface): the
  * higher-order-function fold allocates an intermediate array and evaluates a
  * lambda per element per row; on an all-pairs similarity join (|V|² pairs ×
  * 64 dims) that interpretation cost dominates the whole benchmark. This
  * expression stays inside whole-stage codegen: `doGenCode` emits a tight
  * primitive loop over the two `ArrayData`, no allocation, no virtual calls —
  * the inner kernel a native engine would use, expressed as a first-class
  * Catalyst operator that composes with every other Spark expression.
  *
  * Semantics: length mismatch folds over the common prefix; a null element
  * inside the common prefix makes the result null — exactly what the
  * `zip_with`/`aggregate` fold it replaces produces (null * x = null,
  * null + s = null). Parquet list columns arrive as containsNull=true even
  * when no element is ever null, so the check is explicit rather than
  * rejected at type-check time; when BOTH inputs declare containsNull=false
  * the codegen path skips the per-element null test entirely.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def supported(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (supported(left.dataType) && supported(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Either input may legally contain null elements (parquet default). */
  private def elementsNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean = super.nullable || elementsNullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left)
    val rf = isFloat(right)
    val checkNulls = elementsNullable
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      // per-element null test only when the schema allows null elements —
      // non-null-typed inputs keep the branch-free tight loop
      val nullCheck = if (elementsNullable) {
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      } else ""
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level API over the custom expressions. */
object ArrayMath {

  /** Elementwise dot product in double precision (codegen'd). */
  def dot(a: Column, b: Column): Column =
    GraftSql.column(DotProduct(GraftSql.expression(a), GraftSql.expression(b)))

  /** L2 norm = sqrt(self dot product), same fold order as the HOF form. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, null on zero norm (ANSI-safe). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(null)).otherwise(dot(a, b) / d)
  }
}
