package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document survivor reassembly for substring dedup, as ONE per-row
  * walk: given the token/symbol stream and the (sorted-ascending,
  * distinct) covered positions, emit the cleaned text and the kept-token
  * count directly — `struct(clean string, n_kept long)`.
  *
  * Why: the declarative reassembly exploded every affected document to
  * per-token rows (with their text), anti-joined them against the
  * exploded covered-position set on (doc_id, pos) — a shuffle of the
  * whole affected token stream — and rebuilt through TWO
  * collect_list + array_sort groupBys. All of that is a per-document
  * function of two arrays already sitting in one row; the walk replaces
  * the explode, the anti-join shuffle, and both groupBys (measured at
  * sf1, duplication-heavy corpus: the reassembly stage was 6.1 s of a
  * 19 s query). Value identity: positions ascend during the walk, so
  * kept tokens concatenate in exactly the order the sorted collect_list
  * produced; a fully covered document yields ("", 0), matching the old
  * affected-left-join coalesce.
  */
object RebuildUtil {

  /** Two-pointer test: advance `ci` past covered values < pos; covered
    * is sorted ascending and distinct.
    */
  @inline private def skipTo(covered: ArrayData, ci0: Int, pos: Int): Int = {
    var ci = ci0
    while (ci < covered.numElements() && covered.getInt(ci) < pos) ci += 1
    ci
  }

  /** Word-level: `words` survive unless their position is covered;
    * cleaned text joins survivors with one space.
    */
  def words(words: ArrayData, covered: ArrayData): InternalRow = {
    val sb = new java.lang.StringBuilder(64)
    var kept = 0L
    var ci = 0
    var pos = 0
    val n = words.numElements()
    while (pos < n) {
      ci = skipTo(covered, ci, pos)
      val isCovered =
        ci < covered.numElements() && covered.getInt(ci) == pos
      if (!isCovered) {
        if (kept > 0) sb.append(' ')
        sb.append(words.getUTF8String(pos).toString)
        kept += 1
      }
      pos += 1
    }
    InternalRow(UTF8String.fromString(sb.toString), kept)
  }

  /** BPE-level: `syms` is the (wi, sym) stream; surviving symbols of one
    * word concatenate with no separator, words join with one space (the
    * word order is the order of each word's first surviving symbol —
    * ascending, since wi is non-decreasing in the stream).
    */
  def syms(syms: ArrayData, covered: ArrayData): InternalRow = {
    val sb = new java.lang.StringBuilder(64)
    var kept = 0L
    var ci = 0
    var pos = 0
    var lastWi = -1
    val n = syms.numElements()
    while (pos < n) {
      ci = skipTo(covered, ci, pos)
      val isCovered =
        ci < covered.numElements() && covered.getInt(ci) == pos
      if (!isCovered) {
        val row = syms.getStruct(pos, 2)
        val wi = row.getInt(0)
        if (kept > 0 && wi != lastWi) sb.append(' ')
        sb.append(row.getUTF8String(1).toString)
        lastWi = wi
        kept += 1
      }
      pos += 1
    }
    InternalRow(UTF8String.fromString(sb.toString), kept)
  }

  val OutType: StructType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_kept", LongType, nullable = false)))
}

case class RebuildWords(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"rebuild_words requires (array<string>, array<int>), got ($l, $r)")
    }
  override def dataType: DataType = RebuildUtil.OutType
  override def prettyName: String = "rebuild_words"

  override protected def nullSafeEval(w: Any, c: Any): Any =
    RebuildUtil.words(w.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (w, c) => s"graft.functions.RebuildUtil.words($w, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RebuildWords =
    copy(left = newLeft, right = newRight)
}

case class RebuildSyms(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StructType(fs), _), ArrayType(IntegerType, _))
          if fs.length == 2 && fs(0).dataType == IntegerType &&
            fs(1).dataType == StringType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"rebuild_syms requires (array<struct<int,string>>, array<int>), " +
          s"got ($l, $r)")
    }
  override def dataType: DataType = RebuildUtil.OutType
  override def prettyName: String = "rebuild_syms"

  override protected def nullSafeEval(s: Any, c: Any): Any =
    RebuildUtil.syms(s.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, c) => s"graft.functions.RebuildUtil.syms($s, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RebuildSyms =
    copy(left = newLeft, right = newRight)
}

object RebuildWords {
  def apply(w: Column, c: Column): Column = GraftBridge.column(
    RebuildWords(GraftBridge.expression(w), GraftBridge.expression(c)))
}

object RebuildSyms {
  def apply(s: Column, c: Column): Column = GraftBridge.column(
    RebuildSyms(GraftBridge.expression(s), GraftBridge.expression(c)))
}
