package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-word BPE encoding to the final space-delimited SYMBOL
  * string ("cust omer" → split on ' ' for the symbol list) — the sibling
  * of [[BpeTokenCount]] for operators that need the sub-word tokens
  * themselves, not just their count ([[graft.ops.TextDedup
  * .substringDedupBpe]] windows over this surface). Codegen'd call into
  * the shared frozen-merges encoder with its bounded vocabulary cache;
  * value-identical to the oracle's recursive-CTE encoder over the same
  * merges table (BpeSpec pins word-level goldens for both surfaces).
  */
case class BpeEncode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_encode"

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.evalUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeEncode.evalUtf8($c)")

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  def evalUtf8(word: UTF8String): UTF8String =
    UTF8String.fromString(graft.rules.Bpe.encodeCompact(word.toString))

  def apply(c: Column): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(c)))
}
