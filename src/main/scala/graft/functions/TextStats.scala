package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text statistics (SURVEY §4's candidate (a): the fused
  * `TextFeatures` Catalyst Expression).
  *
  * The clean pipeline (quality_engine.py:113-221 semantics) needs ~8
  * independent counts over the same string — chars, words, sentence marks,
  * alphabetic/digit/upper chars, two punctuation sets, stripped-token
  * length sum, repeated-char runs. As column expressions each count is a
  * separate regexp traversal (and the per-token strip needs a higher-order
  * `aggregate`, which blocks codegen). This expression computes ALL of them
  * in ONE code-point scan, with real whole-stage codegen via a static
  * method call — the standard pattern for native scalar functions.
  *
  * Semantics are bit-compatible with the expression-based forms (and the
  * DuckDB oracle): whitespace is Java regex `\s` = [ \t\n\x0B\f\r]; char
  * classes are the ASCII sets from graft.rules.Rules; `runs4` counts
  * maximal runs (>= 4) restricted to the RepeatedRun4 alternation's char
  * set (the backreference-free form both engines use).
  */
object TextStatsUtil {
  val StripSet = ".,!?;:"
  val PunctFeatureSet = ".,!?;:'\"()-"
  val PunctSpamSet = "!?.,;:"
  val Runs4Set = "abcdefghijklmnopqrstuvwxyz0123456789_ .,!?;:'\"()-"

  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' ||
      cp == '\r'
  @inline private def in(set: String, cp: Int): Boolean =
    cp < 128 && set.indexOf(cp) >= 0

  /** Field order of the result struct. */
  val fields: Seq[String] = Seq("char_count", "word_count", "sentence_marks",
    "alpha", "digit", "upper", "punct_feature", "punct_spam", "strip_sum",
    "runs4")

  // noinspection ScalaStyle — hot loop, kept primitive
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    var chars = 0; var words = 0; var sentence = 0; var alpha = 0
    var digit = 0; var upper = 0; var punctF = 0; var punctS = 0
    var stripSum = 0; var runs4 = 0
    // token state
    var inTok = false; var tokLen = 0; var lead = 0; var leadOpen = true
    var trail = 0
    // run state
    var runCp = -1; var runLen = 0
    def closeTok(): Unit = if (inTok) {
      val stripped = tokLen - lead - trail
      stripSum += (if (stripped > 0) stripped else 0)
      inTok = false; tokLen = 0; lead = 0; leadOpen = true; trail = 0
    }
    def closeRun(): Unit = {
      if (runLen >= 4) runs4 += 1
      runLen = 0; runCp = -1
    }
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      chars += 1
      // class counts
      if (cp >= 'a' && cp <= 'z') alpha += 1
      else if (cp >= 'A' && cp <= 'Z') { alpha += 1; upper += 1 }
      else if (cp >= '0' && cp <= '9') digit += 1
      if (cp == '.' || cp == '!' || cp == '?') sentence += 1
      if (in(PunctFeatureSet, cp)) punctF += 1
      if (in(PunctSpamSet, cp)) punctS += 1
      // tokenization + per-token strip bookkeeping
      if (isWs(cp)) closeTok()
      else {
        if (!inTok) { inTok = true; words += 1 }
        tokLen += 1
        if (in(StripSet, cp)) {
          if (leadOpen) lead += 1
          trail += 1
        } else { leadOpen = false; trail = 0 }
      }
      // maximal-run counting within the restricted set
      if (in(Runs4Set, cp)) {
        if (cp == runCp) runLen += 1
        else { closeRun(); runCp = cp; runLen = 1 }
      } else closeRun()
      i += Character.charCount(cp)
    }
    closeTok(); closeRun()
    InternalRow(chars, words, sentence, alpha, digit, upper, punctF, punctS,
      stripSum, runs4)
  }
}

case class TextStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats requires a string argument, got ${child.dataType}")
  override val dataType: DataType =
    StructType(TextStatsUtil.fields.map(StructField(_, IntegerType, false)))
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextStatsUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  /** Column-API entry: `TextStats(col).getField("word_count")` etc. */
  def apply(c: Column): Column =
    GraftBridge.column(TextStats(GraftBridge.expression(c)))
}
