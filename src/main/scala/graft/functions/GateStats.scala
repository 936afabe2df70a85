package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The ingest gate's word-level statistics in ONE scan of the (lowered)
  * text: every Gopher quality count PLUS the hashed-feature linear
  * classifier margin — the r9 fusion of what previously ran as four
  * separate traversals per row (`split` + per-word `rlike`, a
  * `concat_ws` re-materialization, the `EnStopwords` regex pass, and an
  * interpreted per-word `md5` fold for the classifier).
  *
  * Two independent run machines advance over the same code-point scan:
  *
  *  - WHITESPACE TOKENS — maximal runs of non-ASCII-whitespace
  *    (Java regex `\s` = [ \t\n\x0B\f\r], the `split`-then-filter
  *    tokenizer's exact semantics, leading/empty tokens excluded by
  *    construction). Per token: word count, code-point length sum
  *    (= `length(concat_ws("", words))`), contains-[a-z] flag (the
  *    `rlike("[a-z]")` filter), and the classifier weight — MD5 of the
  *    token's UTF-8 bytes, top 56 bits as the feature hash (exactly
  *    `conv(substring(md5(w),1,14),16,10)`), Knuth-bucket weight
  *    `(h%1024 * ClfKnuth) % ClfCycle - (ClfCycle-1)/2` summed.
  *  - WORD-CHAR RUNS — maximal runs under Java regex `\b`'s word-char
  *    test (`Character.isLetterOrDigit(cp) || cp == '_'`, the same
  *    Pattern-Bound semantics [[LangCountsUtil]] pins); a run equal to
  *    one of the stopword alternation's words counts one stopword match,
  *    which is exactly `regexp_count(text, "\b(w1|...|wn)\b")` (a match
  *    must span a complete run: a boundary cannot sit inside one).
  *
  * Output struct (all derived gate columns are arithmetic over these):
  * wc, chars, alphaw, stops, clf_score. Value identity with the
  * expression forms is pinned by GateStatsSpec on edge cases and real
  * documents; the gate oracle (q_ingest_gate) re-checks it end-to-end
  * against DuckDB's regex derivation.
  */
object GateStatsUtil {

  private val StopRe = """^\\b\((.+)\)\\b$""".r

  /** Stopword set parsed from the shared rule constant — stays coupled
    * to [[graft.rules.Rules.EnStopwords]] by construction.
    */
  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.rules.Rules.EnStopwords match {
      case StopRe(alts) => alts.split('|').foreach { w =>
        require(w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z'),
          s"stopword '$w' is not a plain lowercase literal")
        s.add(w)
      }
      case re => throw new IllegalStateException(
        s"EnStopwords is not a \\b(alternation)\\b regex: $re")
    }
    s
  }

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // the classifier's shared constants — referenced, not duplicated, so
  // the fused scan cannot silently diverge from the expression form
  private def ClfBuckets = graft.ops.TextAnalysis.ClfBuckets
  private def ClfKnuth = graft.ops.TextAnalysis.ClfKnuth
  private def ClfCycle = graft.ops.TextAnalysis.ClfCycle

  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' ||
      cp == '\r'

  /** Java regex's word-char test for `\b` (Pattern's Bound node). */
  @inline private def isWordChar(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val dig = md5.get()
    var wc = 0
    var chars = 0L
    var alphaw = 0
    var stops = 0L
    var score = 0L
    // whitespace-token state
    val tok = new java.lang.StringBuilder(16)
    var sawAlpha = false
    // word-char-run state
    val run = new java.lang.StringBuilder(16)
    def closeTok(): Unit = if (tok.length > 0) {
      wc += 1
      if (sawAlpha) alphaw += 1
      dig.reset()
      val d = dig.digest(tok.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      // top 56 bits of the MD5, big-endian — conv(substring(md5,1,14))
      val h = ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) |
        ((d(2) & 0xffL) << 32) | ((d(3) & 0xffL) << 24) |
        ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) | (d(6) & 0xffL)
      score += (h % ClfBuckets) * ClfKnuth % ClfCycle - (ClfCycle - 1) / 2
      tok.setLength(0)
      sawAlpha = false
    }
    def closeRun(): Unit = if (run.length > 0) {
      if (stopSet.contains(run.toString)) stops += 1
      run.setLength(0)
    }
    val n = str.length
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      if (isWs(cp)) closeTok()
      else {
        tok.appendCodePoint(cp)
        chars += 1
        if (cp >= 'a' && cp <= 'z') sawAlpha = true
      }
      if (isWordChar(cp)) run.appendCodePoint(cp) else closeRun()
      i += Character.charCount(cp)
    }
    closeTok(); closeRun()
    InternalRow(wc, chars, alphaw, stops, score)
  }
}

case class GateStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gate_stats requires a string argument, got ${child.dataType}")
  override val dataType: DataType = StructType(Seq(
    StructField("wc", IntegerType, nullable = false),
    StructField("chars", LongType, nullable = false),
    StructField("alphaw", IntegerType, nullable = false),
    StructField("stops", LongType, nullable = false),
    StructField("clf_score", LongType, nullable = false)))
  override def prettyName: String = "gate_stats"

  override protected def nullSafeEval(input: Any): Any =
    GateStatsUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GateStatsUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): GateStats =
    copy(child = newChild)
}

object GateStats {
  def apply(c: Column): Column =
    GraftBridge.column(GateStats(GraftBridge.expression(c)))
}
