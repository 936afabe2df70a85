package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native fused random-hyperplane LSH bucket signature: ALL `bands * w`
  * plane dot products of one embedding in a single pass, emitting the
  * band-major bucket array `bucket(b) = b * 2^w + key(b)` directly.
  *
  * The column-expression form ([[graft.ops.EmbedLsh.bucketColsRef]]) builds
  * one [[DotProduct]] expression tree per plane — at the adaptive sf1
  * geometry (13 bands x 10 bits = 130 planes) that is 130 independent
  * sub-expressions in one Project, each re-dereferencing the array column
  * and re-running the null prescan, and the generated method count pushes
  * whole-stage codegen into its split/fallback paths. This expression loads
  * the embedding into a primitive array ONCE and runs a tight
  * planes-by-dims loop over a cached sign matrix.
  *
  * Arithmetic is bit-identical to the reference form: per plane a strict
  * left-to-right fold `((0 + e0*s0) + e1*s1) + ...` over `min(len, Dim)`
  * slots with signs +-1.0 (exact sign flips), bit j set iff the sum
  * `>= 0`. Null handling matches DotProduct-under-`when` exactly: a null
  * slot in the zipped prefix nulls every plane dot, so no key bit is set
  * and bucket(b) degrades to `b * 2^w` for all bands. Equivalence asserted
  * in LshBucketSigSpec against the reference form, nulls included.
  */
object LshBucketSigUtil {

  /** Sign matrices cached per plane count — computed once per executor
    * from the same deterministic md5 rule as the oracle
    * ([[graft.ops.EmbedLsh.hyperplanes]]).
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]()

  private def planes(n: Int): Array[Array[Double]] =
    cache.computeIfAbsent(n,
      (_: Integer) => graft.ops.EmbedLsh.hyperplanes(n).toArray)

  def compute(arr: ArrayData, w: Int, bands: Int): ArrayData = {
    val ps = planes(bands * w)
    val dim = ps(0).length
    val n = math.min(arr.numElements(), dim)
    var nullSlot = false
    var i = 0
    while (i < n && !nullSlot) {
      if (arr.isNullAt(i)) nullSlot = true
      i += 1
    }
    val out = new Array[Long](bands)
    if (nullSlot) {
      // every plane dot is null => no sign bit set, key = band offset only
      var b = 0
      while (b < bands) { out(b) = b.toLong << w; b += 1 }
    } else {
      val emb = new Array[Double](n)
      var d = 0
      while (d < n) { emb(d) = arr.getDouble(d); d += 1 }
      var b = 0
      while (b < bands) {
        var key = b.toLong << w
        var j = 0
        while (j < w) {
          val p = ps(b * w + j)
          var s = 0.0
          var k = 0
          while (k < n) { s += emb(k) * p(k); k += 1 }
          if (s >= 0) key |= 1L << j
          j += 1
        }
        out(b) = key
        b += 1
      }
    }
    new GenericArrayData(out)
  }
}

case class LshBucketSig(child: Expression, w: Int, bands: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket_sig requires an array<double> argument, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_bucket_sig"

  override protected def nullSafeEval(input: Any): Any =
    LshBucketSigUtil.compute(input.asInstanceOf[ArrayData], w, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshBucketSigUtil.compute($c, $w, $bands)")

  override protected def withNewChildInternal(newChild: Expression)
      : LshBucketSig = copy(child = newChild)
}

object LshBucketSig {
  def apply(c: Column, w: Int, bands: Int): Column =
    GraftBridge.column(LshBucketSig(GraftBridge.expression(c), w, bands))
}
