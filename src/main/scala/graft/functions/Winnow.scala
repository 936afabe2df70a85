package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused native winnowing (Schleimer et al. 2003) — the upgrade path the
  * column-expression form documented for itself once the profile showed
  * the O(n·W) window slicing dominating:
  *
  *  - [[CharGramHashes]]: every GramLen-codepoint character gram
  *    md5-prefix-hashed (the engine-wide h56 rule) in one pass — the
  *    interpreted `transform(substr…) -> md5 -> conv` chain allocated a
  *    UTF8String + hex round-trip per gram;
  *  - [[WinnowFps]]: the selected fingerprints (each window's MINIMUM
  *    hash, RIGHTMOST occurrence on ties, adjacent-deduplicated) via the
  *    standard monotonic-deque sliding minimum — O(n) instead of
  *    per-window `array_min(slice(...))` re-scans.
  *
  * Selection is value-identical to the declarative rule the DuckDB
  * oracle states (`p + W - position(reverse(window), min(window))`):
  * the rightmost-min index is non-decreasing as the window slides, so
  * the deque's adjacent dedup equals the oracle's list_distinct.
  */
object WinnowUtil {

  /** h56 over every GramLen-codepoint gram of `s`; empty when shorter. */
  def charGramHashes(s: UTF8String, gramLen: Int): UnsafeArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length - (gramLen - 1)
    if (n <= 0)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = MinHashSigUtil.h56(new String(cps, i, gramLen))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Winnowing selection over a hash array: per window of `w`, the
    * minimum value (rightmost on ties), deduplicated — emitted in
    * document order.
    */
  def select(arr: ArrayData, w: Int): UnsafeArrayData = {
    val n = arr.numElements()
    if (n < w)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val hs = arr.toLongArray()
    val out = new Array[Long](n - w + 1)
    var m = 0
    // deque of indices with strictly increasing values; popping >= on
    // entry makes the front the RIGHTMOST minimum of its window
    val dq = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    var i = 0
    var lastIdx = -1
    while (i < n) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1 && dq(head) != lastIdx) {
        lastIdx = dq(head)
        out(m) = hs(lastIdx); m += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, m))
  }
}

case class CharGramHashes(child: Expression, gramLen: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && gramLen >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_gram_hashes requires (string, gramLen >= 1), got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"
  override protected def nullSafeEval(input: Any): Any =
    WinnowUtil.charGramHashes(input.asInstanceOf[UTF8String], gramLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowUtil.charGramHashes($c, $gramLen)")
  override protected def withNewChildInternal(n: Expression): CharGramHashes =
    copy(child = n)
}

object CharGramHashes {
  def apply(c: Column, gramLen: Int): Column =
    GraftBridge.column(CharGramHashes(GraftBridge.expression(c), gramLen))
}

case class WinnowFps(child: Expression, w: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if w >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires (array<bigint>, w >= 1), got ${child.dataType}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"
  override protected def nullSafeEval(input: Any): Any =
    WinnowUtil.select(input.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowUtil.select($c, $w)")
  override protected def withNewChildInternal(n: Expression): WinnowFps =
    copy(child = n)
}

object WinnowFps {
  def apply(c: Column, w: Int): Column =
    GraftBridge.column(WinnowFps(GraftBridge.expression(c), w))
}
