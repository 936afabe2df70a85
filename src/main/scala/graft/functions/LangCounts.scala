package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Every language-profile match count in ONE scan of the (lowered) text —
  * the fused form of the language detector's N regex traversals.
  *
  * Each profile is one of the two regex shapes the detector uses, parsed
  * at construction:
  *
  *  - stopword alternation `\b(w1|w2|...)\b` — plain lowercase-ASCII
  *    words. A match can only be a MAXIMAL word-char run that equals
  *    one of the alternation's words (there is no boundary inside a
  *    run), and `regexp_count` counts each such run once, so the fused
  *    count = number of word-runs present in the profile's word set —
  *    one hash lookup per run against a word → profile-indices table.
  *    The word-char predicate mirrors what Spark's Java regex ACTUALLY
  *    uses for `\b` — `Character.isLetterOrDigit(cp) || cp == '_'`
  *    (java.util.regex.Pattern's Bound node; probed across BMP +
  *    supplementary letters, digits in other scripts, combining marks,
  *    letter-numbers) — NOT the ASCII `\w` set: Java treats é/世/ß as
  *    word chars for boundary purposes, so "éthe" does NOT match
  *    `\bthe\b` under Spark (while RE2's ASCII `\b` would match; the
  *    engine keeps Spark's semantics — the corpora are ASCII-safe where
  *    it matters, and the parity spec pins the Java behavior).
  *  - script codepoint class `[\x{lo}-\x{hi}]` — a single BMP range.
  *    The detector's idiom `length(x) - length(regexp_replace(x, cls,
  *    ""))` counts UTF-16 code units removed, which for BMP-only ranges
  *    is the number of code units inside the range; surrogate code
  *    units never fall inside any profile range (all ranges end below
  *    0xD800 or sit in non-surrogate blocks), so a plain per-code-unit
  *    range check reproduces the regex count exactly. Ranges are
  *    pairwise disjoint (verified at construction) and binary-searched.
  *
  * Output: `array<int>` of the counts in the profiles' declaration
  * order. Null text → null (callers guard like the regex form did).
  * Value identity with the regex chain is pinned by LangCountsSpec on
  * hand edge cases (punctuation boundaries, digit/underscore-extended
  * runs, accented splits, surrogate neighbors) and on real documents.
  */
object LangCountsUtil {

  final class Table(
      val words: java.util.HashMap[String, Array[Int]],
      val rangeLo: Array[Int],
      val rangeHi: Array[Int],
      val rangeIdx: Array[Int],
      val minLo: Int,
      val n: Int) extends Serializable

  private val StopRe = """^\\b\((.+)\)\\b$""".r
  private val RangeRe =
    """^\[\\x\{([0-9a-fA-F]+)\}-\\x\{([0-9a-fA-F]+)\}\]$""".r

  /** Parse the ordered profile regexes into the scan table; rejects any
    * regex outside the two supported shapes (callers keep the regex
    * path for anything else).
    */
  def table(profiles: Seq[String]): Table = {
    val words = new java.util.HashMap[String, Array[Int]]()
    val ranges = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
    profiles.zipWithIndex.foreach {
      case (StopRe(alts), i) =>
        alts.split('|').foreach { w =>
          require(w.nonEmpty && w.forall(c =>
            (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'),
            s"stopword '$w' is not a plain \\w literal")
          val prev = words.get(w)
          // a word repeated inside ONE profile's alternation must still
          // count each run once (regexp_count semantics) — dedupe i
          words.put(w,
            if (prev == null) Array(i)
            else if (prev.last == i) prev
            else prev :+ i)
        }
      case (RangeRe(lo, hi), i) =>
        ranges += ((Integer.parseInt(lo, 16), Integer.parseInt(hi, 16), i))
      case (re, _) =>
        throw new IllegalArgumentException(
          s"unsupported language-profile regex shape: $re")
    }
    val sorted = ranges.sortBy(_._1).toArray
    var p = 0
    while (p + 1 < sorted.length) {
      require(sorted(p)._2 < sorted(p + 1)._1,
        s"overlapping script ranges: ${sorted(p)} vs ${sorted(p + 1)}")
      p += 1
    }
    sorted.foreach { case (lo, hi, _) =>
      require(hi < 0xD800 || lo > 0xDFFF,
        s"script range [$lo,$hi] intersects the surrogate block")
      // the regex idiom counts UTF-16 code units (2 per astral char);
      // the scan counts codepoints — identical only within the BMP, so
      // supplementary-plane ranges must fail fast, not silently halve
      require(hi <= 0xFFFF,
        s"script range [$lo,$hi] leaves the BMP; the code-unit-identity " +
          "contract only holds for BMP ranges")
    }
    new Table(words,
      sorted.map(_._1), sorted.map(_._2), sorted.map(_._3),
      if (sorted.isEmpty) Int.MaxValue else sorted.head._1,
      profiles.size)
  }

  /** Java regex's word-char test for `\b` (Pattern's Bound node). */
  @inline private def isWordChar(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  def compute(s: UTF8String, t: Table): UnsafeArrayData = {
    val str = s.toString
    val out = new Array[Int](t.n)
    val sb = new java.lang.StringBuilder(16)
    def flushRun(): Unit =
      if (sb.length > 0) {
        val hit = t.words.get(sb.toString)
        if (hit != null) {
          var k = 0
          while (k < hit.length) { out(hit(k)) += 1; k += 1 }
        }
        sb.setLength(0)
      }
    val len = str.length
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      if (isWordChar(cp)) sb.appendCodePoint(cp) else flushRun()
      // script ranges apply to EVERY codepoint (CJK etc. are word chars
      // under Java's \b); supplementary codepoints fail the BMP bounds
      if (cp >= t.minLo && t.rangeLo.length > 0) {
        // rightmost range with lo <= cp, then bound-check
        var lo = 0
        var hi = t.rangeLo.length - 1
        while (lo < hi) {
          val mid = (lo + hi + 1) >>> 1
          if (t.rangeLo(mid) <= cp) lo = mid else hi = mid - 1
        }
        if (t.rangeLo(lo) <= cp && cp <= t.rangeHi(lo))
          out(t.rangeIdx(lo)) += 1
      }
      i += Character.charCount(cp)
    }
    flushRun()
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class LangCounts(child: Expression, profiles: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_counts requires string, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lang_counts"

  @transient private lazy val tbl = LangCountsUtil.table(profiles)

  override protected def nullSafeEval(input: Any): Any =
    LangCountsUtil.compute(input.asInstanceOf[UTF8String], tbl)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("langTable", tbl,
      classOf[LangCountsUtil.Table].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LangCountsUtil.compute($c, $tRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): LangCounts =
    copy(child = newChild)
}

object LangCounts {
  def apply(c: Column, profiles: Seq[String]): Column =
    GraftBridge.column(LangCounts(GraftBridge.expression(c), profiles))
}
