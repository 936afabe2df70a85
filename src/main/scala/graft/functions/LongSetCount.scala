package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** How many elements of an `array<long>` are members of a broadcast
  * sorted long set — the per-row membership count that makes a
  * broadcast-dimension semi-join STATELESS: the streaming curation gate
  * counts each arriving document's shared benchmark-gram hashes against
  * the (broadcast-sized, static) eval-suite gram set without any join or
  * aggregation, so the check can legally precede a stateful streaming
  * operator (an aggregation there would demand watermark state and trip
  * the multi-stateful restriction).
  *
  * The set rides a Spark `Broadcast` — shipped once per executor, not
  * once per task closure — and is resolved to a plain `long[]` once per
  * codegen'd operator instance, after which each row pays only
  * binary searches. Input arrays are expected distinct (the native
  * ShingleHashes emits first-occurrence-distinct hashes), so the count
  * over them equals the batch `count_distinct` of matched grams.
  */
object LongSetCountUtil {
  def count(arr: ArrayData, set: Array[Long]): Long = {
    var i = 0
    var n = 0L
    while (i < arr.numElements()) {
      // getLong on a null slot returns garbage (often 0) — a null
      // element must never count as a member
      if (!arr.isNullAt(i) &&
          java.util.Arrays.binarySearch(set, arr.getLong(i)) >= 0) n += 1
      i += 1
    }
    n
  }
}

case class LongSetCount(child: Expression, set: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"long_set_count requires array<long>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_set_count"

  @transient private lazy val resolvedSet: Array[Long] = set.value

  override protected def nullSafeEval(input: Any): Any =
    LongSetCountUtil.count(input.asInstanceOf[ArrayData], resolvedSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bcSet", set,
      classOf[Broadcast[Array[Long]]].getName)
    // resolve the broadcast ONCE per operator instance, not per row
    val arr = ctx.addMutableState("long[]", "longSet",
      v => s"$v = (long[]) $bcRef.value();")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LongSetCountUtil.count($c, $arr)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): LongSetCount =
    copy(child = newChild)
}

object LongSetCount {
  def apply(c: Column, set: Broadcast[Array[Long]]): Column =
    GraftBridge.column(LongSetCount(GraftBridge.expression(c), set))
}
