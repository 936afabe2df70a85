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

  /** `\s+`-split of `str` as per-word UTF-8 byte arrays (no gram or word
    * Strings survive tokenization — the whole point of the native pass).
    */
  private[functions] def tokenize(
      str: String): scala.collection.mutable.ArrayBuffer[Array[Byte]] = {
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
    words
  }

  /** First 7 digest bytes as the non-negative 56-bit long — exactly
    * `conv(substring(md5(s), 1, 14), 16, 10)`.
    */
  @inline private[functions] def h56(d: Array[Byte]): Long = {
    var h = 0L
    var b = 0
    while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
    h
  }

  def compute(s: UTF8String, k: Int, distinct: Boolean): UnsafeArrayData = {
    val words = tokenize(s.toString)
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
      val h = h56(md.digest())
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

/** The bigram-LM stream in one native pass: for every bigram position p
  * of the LOWERED text, the pair `(h1 = h56(w_p), hb = h56("w_p
  * w_{p+1}"))` — the prefix key and the bigram key of
  * [[graft.ops.TextAnalysis.lmScore]]'s conditional-probability tables,
  * already hashed.
  *
  * Why native (the ShingleHashes precedent, round 7's 23× dsir win
  * applied to the registry's #1/#2 absolute costs): the declarative
  * bigram stream (`explode(transform(sequence(...), i =>
  * struct(element_at(words, i+1), element_at(words, i+2))))`,
  * TextAnalysis.scala prior form) is an interpreted HOF materializing a
  * struct of two string copies per bigram per row — and lmScore's
  * consumers execute that subtree multiple times (count table, stream
  * join). Here each word's UTF-8 bytes are materialized once and both
  * hashes stream over byte slices; downstream, counts and salted joins
  * key on 8-byte longs instead of string pairs, which also shrinks the
  * two shuffles (the corpus-sized bigram stream and the count-table
  * join) from arbitrary-width text keys to fixed 16-byte rows.
  *
  * Value identity: the counts c(w1,w2) and c_prefix(w1) keyed on (h1,
  * hb) equal the string-keyed counts unless two distinct corpus
  * words/bigrams collide in h56 — the engine's standing 2^56 policy
  * (same adjudication as ngramNovelty's distinct-by-hash; probability
  * ~types²/2^57). The oracle states the string-keyed chain; values
  * match by this policy, not by byte identity.
  */
object BigramPairHashesUtil {

  private val Md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private val Space = Array[Byte](' ')

  private val Empty =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = ShingleHashesUtil.tokenize(s.toString)
    val n = words.length
    if (n < 2) return Empty
    val md = Md.get()
    // unigram hashes for prefix keys (the last word is never a prefix)
    val uni = new Array[Long](n - 1)
    var p = 0
    while (p < n - 1) {
      md.reset()
      md.update(words(p))
      uni(p) = ShingleHashesUtil.h56(md.digest())
      p += 1
    }
    val out = new Array[Any](n - 1)
    p = 0
    while (p < n - 1) {
      md.reset()
      md.update(words(p))
      md.update(Space)
      md.update(words(p + 1))
      out(p) = org.apache.spark.sql.catalyst.InternalRow(
        uni(p), ShingleHashesUtil.h56(md.digest()))
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class BigramPairHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bigram_pair_hashes requires string, got $t")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h1", LongType, nullable = false),
      StructField("hb", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bigram_pair_hashes"

  override protected def nullSafeEval(input: Any): Any =
    BigramPairHashesUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BigramPairHashesUtil.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): BigramPairHashes =
    copy(child = newChild)
}

object BigramPairHashes {
  def apply(c: Column): Column =
    GraftBridge.column(BigramPairHashes(GraftBridge.expression(c)))
}
