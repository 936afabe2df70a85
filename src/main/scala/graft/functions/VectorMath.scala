package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native sequential dot product over two `array<double>` columns.
  *
  * The expression-API form — `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`
  * — is a pair of interpreted higher-order functions: it blocks whole-stage
  * codegen, allocates an intermediate array per evaluation, and dispatches
  * a lambda per element. In the similarity-search operators the dot product
  * runs once per (query, candidate) PAIR, so at 100 TB that interpretation
  * overhead multiplies by the full candidate volume. This expression is one
  * primitive loop, codegen'd via a static call (same pattern as
  * [[TextStats]]).
  *
  * Arithmetic is bit-identical to the HOF form and to DuckDB's
  * `list_reduce(list_transform(...))` oracle: a strict left-to-right fold
  * `((0 + a0*b0) + a1*b1) + ...` over doubles.
  */
object VectorMathUtil {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** True iff any slot in the zipped prefix is null. Split from [[dot]] so
    * the hot loop stays branch-free; this pass is a bitmap scan on
    * UnsafeArrayData and predicts perfectly on null-free (the common) data.
    */
  def anyNullSlot(a: ArrayData, b: ArrayData): Boolean = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two array<double> arguments, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  /** Nullable even over non-null array columns: a null ELEMENT yields a null
    * result (matching `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`, where
    * null * x propagates), rather than silently treating the slot as 0.0 —
    * the function is registered session-wide as SQL `dot_product` for any
    * array<double> including containsNull=true.
    */
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (ad, bd) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (VectorMathUtil.anyNullSlot(ad, bd)) null else VectorMathUtil.dot(ad, bd)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if (graft.functions.VectorMathUtil.anyNullSlot($a, $b)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.VectorMathUtil.dot($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
