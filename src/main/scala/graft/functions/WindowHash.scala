package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial window hash over a token array: the signature of
  * every K-token sliding window in ONE O(n) pass —
  * `g(p) = Σ_{j<K} h56(tok[p+j]) · B^(K-1-j) mod P` with P = 2^61-1
  * (Mersenne) and B = 1e9+7, advanced by the standard Rabin-Karp
  * recurrence `g(p+1) = (g(p) - th[p]·B^(K-1))·B + th[p+K-1]`.
  *
  * This replaces the O(n·K) per-position slice+concat+hash form
  * (substringDedup's original gram build — at K = 20 BPE tokens the
  * concat amplification was ~20x the corpus in string copies, and HOF
  * transforms run interpreted). Each token is md5-prefix-hashed
  * ([[MinHashSigUtil.h56]], the engine-wide h56 rule) exactly once.
  *
  * The DuckDB oracle states the CLOSED form (per-position Σ th·B^j in
  * HUGEINT, same constants) — modular arithmetic makes recurrence and
  * closed form value-identical, so gram keys stay oracle-exact.
  * Collision space is ~2^61 — vs h56's 2^56, strictly wider than the
  * scheme it replaces.
  */
object WindowHashUtil {
  val P: Long = (1L << 61) - 1
  val B: Long = 1000000007L

  /** a·b mod P for 0 <= a, b < P via the 128-bit product split:
    * 2^64 ≡ 8 (mod 2^61-1).
    */
  @inline def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (lo & P) + (lo >>> 61) + hi * 8
    r = (r & P) + (r >>> 61)
    if (r >= P) r - P else r
  }

  @inline private def addmod(a: Long, b: Long): Long = {
    val r = a + b
    if (r >= P) r - P else r
  }

  @inline private def submod(a: Long, b: Long): Long = {
    val r = a - b
    if (r < 0) r + P else r
  }

  def powB(e: Int): Long = {
    var r = 1L; var i = 0
    while (i < e) { r = mulmod(r, B); i += 1 }
    r
  }

  /** Oracle-side power table: [B^(k-1), ..., B^1, B^0] mod P. */
  def powTable(k: Int): Seq[Long] = (k - 1) to 0 by -1 map powB

  def compute(arr: ArrayData, k: Int): UnsafeArrayData = {
    val n = arr.numElements()
    if (n < k)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = MinHashSigUtil.h56(arr.getUTF8String(i).toString)
      i += 1
    }
    val bk1 = powB(k - 1)
    val out = new Array[Long](n - k + 1)
    var g = 0L
    i = 0
    while (i < k) { g = addmod(mulmod(g, B), th(i)); i += 1 }
    out(0) = g
    var p = 1
    while (p <= n - k) {
      g = addmod(mulmod(submod(g, mulmod(th(p - 1), bk1)), B), th(p + k - 1))
      out(p) = g
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class WindowHash(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"window_hash requires (array<string>, k >= 1), got ${child.dataType}, k=$k")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hash"

  override protected def nullSafeEval(input: Any): Any =
    WindowHashUtil.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WindowHashUtil.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WindowHash =
    copy(child = newChild)
}

object WindowHash {
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(WindowHash(GraftBridge.expression(c), k))
}
