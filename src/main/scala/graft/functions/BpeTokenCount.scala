package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE token count: lowers the text, splits on the shared `\s`
  * tokenizer class, and sums each word's frozen-merges BPE token count
  * ([[graft.rules.Bpe]]) — one codegen'd corpus scan, no word explode, no
  * UDF serde. Per-word results memoize in Bpe's bounded vocabulary cache
  * (BPE cost tracks the Zipf vocabulary, not the corpus). Value-identical
  * to the oracle's recursive-CTE encoder over the same merges table.
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override protected def nullSafeEval(input: Any): Any =
    graft.rules.Bpe.tokenCountText(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.rules.Bpe.tokenCountText($c.toString())")

  override protected def withNewChildInternal(
      newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  def apply(c: Column): Column =
    GraftBridge.column(BpeTokenCount(GraftBridge.expression(c)))
}
