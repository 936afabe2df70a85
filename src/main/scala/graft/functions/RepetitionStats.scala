package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass Gopher repetition signals over a token array:
  * `[distinct_word_count, max_bigram_count]` — the two scalars
  * [[graft.ops.TextAnalysis.repetition]] derives its fractions from.
  * Replaces a per-row `array_distinct` + bigram array build +
  * `array_sort` + interpreted longest-equal-run fold (O(n log n) per
  * row through HOF closures) with two hash-map passes. The max COUNT of
  * any bigram equals the longest equal run in the sorted bigram list,
  * so the downstream fractions are value-identical.
  */
object RepetitionStatsUtil {
  def compute(arr: ArrayData): UnsafeArrayData = {
    val n = arr.numElements()
    val words = new Array[String](n)
    var i = 0
    while (i < n) { words(i) = arr.getUTF8String(i).toString; i += 1 }
    val seen = new java.util.HashSet[String](math.max(16, n * 2))
    i = 0
    while (i < n) { seen.add(words(i)); i += 1 }
    var maxBg = 0L
    if (n >= 2) {
      val counts = new java.util.HashMap[String, Int](n * 2)
      i = 0
      while (i < n - 1) {
        val bg = words(i) + " " + words(i + 1)
        val c = counts.merge(bg, 1, (a, b) => a + b)
        if (c > maxBg) maxBg = c
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(Array(seen.size.toLong, maxBg))
  }
}

case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires array<string>, got ${child.dataType}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"
  override protected def nullSafeEval(input: Any): Any =
    RepetitionStatsUtil.compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RepetitionStatsUtil.compute($c)")
  override protected def withNewChildInternal(n: Expression): RepetitionStats =
    copy(child = n)
}

object RepetitionStats {
  def apply(c: Column): Column =
    GraftBridge.column(RepetitionStats(GraftBridge.expression(c)))
}
