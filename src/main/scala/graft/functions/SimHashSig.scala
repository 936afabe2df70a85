package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 56-bit SimHash signature packed into one long: tokenize (Java
  * `\s` set), md5-prefix hash each word once, accumulate the 56 signed
  * bit sums, set bit b iff its sum is positive — one pass, no per-word
  * 56-wide interpreted zip_with (the column-expression form allocates a
  * 56-element array per word per row). Value-identical to
  * `graft.ops.TextDedup.simhashLongRef` (same md5 prefix h56, same sign
  * rule), which the DuckDB oracle mirrors; equivalence is asserted in
  * FunctionsSpec. Callers pass LOWERED text (same contract as
  * [[MinHashSig]]).
  */
object SimHashSigUtil {

  private val Bits = graft.ops.TextDedup.SimhashBits

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  // digest() resets the instance, so per-thread reuse is safe — a fresh
  // MessageDigest per token is pure allocation churn in the hot loop
  private val Md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private def h56(s: String): Long = {
    val d = Md.get().digest(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h // 56 bits, non-negative
  }

  def compute(s: UTF8String): Long = {
    val str = s.toString
    val sums = new Array[Int](Bits)
    var i = 0; var start = -1
    def fold(w: String): Unit = {
      val h = h56(w)
      var b = 0
      while (b < Bits) {
        if (((h >> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
    }
    while (i < str.length) {
      val ws = isWs(str.charAt(i))
      if (!ws && start < 0) start = i
      if (ws && start >= 0) { fold(str.substring(start, i)); start = -1 }
      i += 1
    }
    if (start >= 0) fold(str.substring(start))
    var sh = 0L
    var b = 0
    while (b < Bits) { if (sums(b) > 0) sh |= 1L << b; b += 1 }
    sh
  }
}

case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    SimHashSigUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashSigUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  def apply(c: Column): Column =
    GraftBridge.column(SimHashSig(GraftBridge.expression(c)))
}
