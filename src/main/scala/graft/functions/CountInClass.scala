package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of code points belonging to a fixed character set — the fused form
  * of the `length(x) - length(regexp_replace(x, '[class]', ''))` idiom
  * (one scan, no regex machinery, fully codegen'd). Installed by
  * [[graft.rules.CountInClassRule]]; also usable directly.
  */
object CountInClassUtil {
  def count(s: UTF8String, set: String): Int = {
    val str = s.toString
    var i = 0; var n = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      var j = 0; var hit = false
      while (j < set.length && !hit) {
        if (set.charAt(j) == cp) hit = true
        j += 1
      }
      if (hit) n += 1
      i += Character.charCount(cp)
    }
    n
  }
}

case class CountInClass(child: Expression, chars: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_in_class requires a string argument, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_class"

  override protected def nullSafeEval(input: Any): Any =
    CountInClassUtil.count(input.asInstanceOf[UTF8String], chars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("charSet", chars, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CountInClassUtil.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInClass =
    copy(child = newChild)
}

object CharClassParser {
  /** Conservatively parse a regex single-char-class `[...]` into its
    * expanded member set. Returns None for anything beyond plain chars,
    * `\\`-escapes of punctuation, and ASCII ranges (negations, \d/\p/\x
    * classes, etc. keep the regex path).
    */
  def expand(pattern: String): Option[String] = {
    if (pattern.length < 3 || pattern.head != '[' || pattern.last != ']')
      return None
    val body = pattern.substring(1, pattern.length - 1)
    if (body.startsWith("^") || body.contains("[")) return None
    val out = new StringBuilder
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\') {
        if (i + 1 >= body.length) return None
        val e = body.charAt(i + 1)
        // only literal escapes; \d \w \s \p \x etc. -> bail
        if (e.isLetterOrDigit) return None
        out.append(e); i += 2
      } else if (i + 2 < body.length && body.charAt(i + 1) == '-' &&
        body.charAt(i + 2) != ']') {
        val hi = body.charAt(i + 2)
        if (hi == '\\' || hi < c || hi - c > 128) return None
        (c to hi).foreach(out.append)
        i += 3
      } else {
        out.append(c); i += 1
      }
    }
    Some(out.result())
  }
}
