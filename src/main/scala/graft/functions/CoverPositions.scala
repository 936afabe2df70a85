package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The union of K-wide windows: given the duplicate-window START
  * positions of one document, every position covered by some window
  * [s, s+K-1] — emitted once, ascending.
  *
  * Why: substring dedup's covered-position set was built by exploding
  * EVERY losing window to its K positions and running a corpus-wide
  * `distinct` — on a duplication-heavy corpus that is a K× blow-up
  * (measured at sf1: 11.2M gram rows → ~120M exploded positions
  * shuffled into distinct → 6.7M survivors; the stage dominated the
  * query at 13.7 s of ~23). Here the starts ride ONE per-doc groupBy
  * (bounded by document length, the same bound the reassembly groupBys
  * already carry) and the interval union is a linear merge per row —
  * the exploded output IS the distinct set, so the K× intermediate and
  * its shuffle never exist.
  */
object CoverPositionsUtil {
  def compute(starts: ArrayData, k: Int): UnsafeArrayData = {
    val n = starts.numElements()
    val s = new Array[Int](n)
    var i = 0
    while (i < n) { s(i) = starts.getInt(i); i += 1 }
    java.util.Arrays.sort(s)
    // total covered size first (exact allocation)
    var total = 0
    i = 0
    var hi = Int.MinValue // exclusive end of the merged region so far
    while (i < n) {
      val lo = math.max(s(i), hi)
      val end = s(i) + k
      if (end > lo) total += end - lo
      if (end > hi) hi = end
      i += 1
    }
    val out = new Array[Int](total)
    var m = 0
    i = 0
    hi = Int.MinValue
    while (i < n) {
      var lo = math.max(s(i), hi)
      val end = s(i) + k
      while (lo < end) { out(m) = lo; m += 1; lo += 1 }
      if (end > hi) hi = end
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class CoverPositions(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) if k >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cover_positions requires (array<int>, k >= 1), got $t, k=$k")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cover_positions"

  override protected def nullSafeEval(input: Any): Any =
    CoverPositionsUtil.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CoverPositionsUtil.compute($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): CoverPositions =
    copy(child = newChild)
}

object CoverPositions {
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(CoverPositions(GraftBridge.expression(c), k))
}
