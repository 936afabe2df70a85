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

  /** Quantized ADC sum: Σ_m floor(lut[m·k + codes[m]] · scale + 0.5) as an
    * exact integer — the per-candidate inner loop of PQ scoring
    * ([[graft.ops.EmbedPq]]), identical arithmetic to the SQL form
    * `sum(cast(floor(v * scale + 0.5) as long))` per subspace.
    */
  def adcSum(codes: ArrayData, lut: ArrayData, k: Int, scale: Double): Long = {
    val m = codes.numElements()
    var s = 0L
    var i = 0
    while (i < m) {
      val v = lut.getDouble(i * k + codes.getLong(i).toInt)
      s += math.floor(v * scale + 0.5).toLong
      i += 1
    }
    s
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

/** Native quantized ADC sum over a packed code array (`array<bigint>`,
  * codes[m] = the candidate's code for subspace m) and a dense per-query
  * LUT (`array<double>`, slot m·k + code). One primitive loop per
  * (query, candidate) pair — this runs at candidate volume, exactly like
  * [[DotProduct]], and for the same reason must not be written with
  * interpreted higher-order functions (measured at sf3: HOF form 69 s,
  * unrolled element_at chain 20 s, this expression — see SCALING.md).
  * The integer result ÷ scale is the caller's quantized double; summation
  * order is irrelevant (exact longs), matching the DuckDB oracle's
  * per-subspace `sum(cast(floor(v·scale + 0.5) as bigint))`.
  */
case class AdcSum(codes: Expression, lut: Expression, k: Int, scale: Double)
    extends BinaryExpression {

  override def left: Expression = codes
  override def right: Expression = lut

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, lut.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_sum requires (array<bigint>, array<double>), got $l and $r")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "adc_sum"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMathUtil.adcSum(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], k, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMathUtil.adcSum($a, $b, $k, ${scale}d)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcSum = copy(codes = newLeft, lut = newRight)
}

object AdcSum {
  def apply(codes: Column, lut: Column, k: Int, scale: Double): Column =
    GraftBridge.column(AdcSum(GraftBridge.expression(codes),
      GraftBridge.expression(lut), k, scale))
}
