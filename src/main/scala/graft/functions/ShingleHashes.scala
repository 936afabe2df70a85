package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** h56 hashes of every word k-shingle of a LOWERED text, in one pass —
  * `h56("w_p w_{p+1} ... w_{p+k-1}")` for each window position p
  * (k = 1 is the unigram stream), optionally first-occurrence-distinct.
  *
  * Value-identical BY BYTES to the declarative chain it replaces
  * (`explode(shingles(words(text), k))` → `conv(substring(md5(gram),
  * 1, 14), 16, 10)`): the words are the same `\s+`-split of the same
  * lowered string, and md5 over `bytes(w1) ++ ' ' ++ bytes(w2)` IS md5
  * of the space-joined gram, because UTF-8 concatenation commutes with
  * string concatenation. The oracles (dsir, ngram-novelty) state the
  * textual md5 chain and are untouched.
  *
  * Why native: the declarative form materializes every gram as a fresh
  * concatenated string — and the consumers execute their gram subtree
  * TWICE (once into the frequency/bucket table, once into the per-doc
  * collapse; no shared exchange to reuse), so a corpus pass allocates
  * ~2 × Σ(words) gram strings before hashing a byte. At sf5 that was
  * ~75M allocations per bench pass and the measured onset of
  * super-linear GC cost (SCALING.md §sf5: q_dsir 2.69× on 1.67× data).
  * Here each word's UTF-8 bytes are materialized once and the digest
  * streams over byte slices — no per-gram string exists at all.
  */
object ShingleHashesUtil {

  private val Md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private val Space = Array[Byte](' ')

  // the shared tokenizer's \s class exactly (see graft.rules.Bpe.isWs)
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  def compute(s: UTF8String, k: Int, distinct: Boolean): UnsafeArrayData = {
    val str = s.toString
    // tokenize once; keep each word's UTF-8 bytes, not a String
    val words = new scala.collection.mutable.ArrayBuffer[Array[Byte]](64)
    var i = 0; var start = -1
    while (i <= str.length) {
      val ws = i == str.length || isWs(str.charAt(i))
      if (!ws && start < 0) start = i
      if (ws && start >= 0) {
        words += str.substring(start, i)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        start = -1
      }
      i += 1
    }
    val n = words.length
    if (n < k)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val md = Md.get()
    val out = new Array[Long](n - k + 1)
    val seen = if (distinct) new java.util.HashSet[java.lang.Long]() else null
    var m = 0
    var p = 0
    while (p <= n - k) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(Space)
        md.update(words(p + j))
        j += 1
      }
      val d = md.digest()
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      if (seen == null || seen.add(h)) { out(m) = h; m += 1 }
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }
}

case class ShingleHashes(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires (string, k >= 1), got ${child.dataType}, k=$k")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashesUtil.compute(input.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashesUtil.compute($c, $k, $distinct)")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def apply(c: Column, k: Int, distinct: Boolean = false): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(c), k, distinct))
}
