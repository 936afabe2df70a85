package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole document's BPE symbol stream in ONE codegen'd pass:
  * `(wi, sym)` structs for every final symbol of every word in the input
  * word array — [[graft.ops.TextDedup.substringDedupBpe]]'s `_syms`
  * surface (word index `wi` keeps word boundaries alive into sub-word
  * reassembly).
  *
  * Why native: the declarative form —
  * `flatten(transform(words, (w, wi) => transform(split(BpeEncode(w),
  * " "), s => struct(wi, s))))` — runs TWO interpreted higher-order
  * functions per word, allocating a split-result array, an interpreted
  * struct row per symbol, a nested array per word, and a flatten copy of
  * everything; and the query's plan evaluates that subtree for the gram
  * build AND (via `size`) wherever `n_tokens` is referenced. Here the
  * per-word encoding comes straight from the shared frozen-merges
  * encoder (same bounded vocabulary cache as [[BpeEncode]] /
  * [[BpeTokenCount]] — value identity is by shared implementation, not
  * parallel maintenance) and each symbol materializes exactly one
  * `InternalRow`.
  */
object BpeSymbolsUtil {
  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * 2)
    var wi = 0
    while (wi < n) {
      val enc = graft.rules.Bpe.encodeCompact(words.getUTF8String(wi).toString)
      val len = enc.length
      var start = 0
      var i = 0
      while (i <= len) {
        if (i == len || enc.charAt(i) == ' ') {
          if (i > start)
            out += InternalRow(wi,
              UTF8String.fromString(enc.substring(start, i)))
          start = i + 1
        }
        i += 1
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class BpeSymbols(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_symbols requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("wi", IntegerType, nullable = false),
      StructField("sym", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bpe_symbols"

  override protected def nullSafeEval(input: Any): Any =
    BpeSymbolsUtil.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeSymbolsUtil.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): BpeSymbols =
    copy(child = newChild)
}

object BpeSymbols {
  def apply(c: Column): Column =
    GraftBridge.column(BpeSymbols(GraftBridge.expression(c)))
}
