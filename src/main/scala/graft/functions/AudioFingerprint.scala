package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native 64-bit acoustic fingerprint over an encoded audio payload —
  * the per-clip signature of the cross-modal dedup tier's audio
  * modality, the exact 1-D analog of [[ImageDHash]] (reference scope:
  * the engine dedups text at every granularity and images as of r9;
  * this closes audio with the same near-dup contract, built on the
  * already-real `javax.sound.sampled` PCM decode of `graft.ops.Media`).
  *
  * Pipeline per row, one codegen'd call, no UDF serde:
  *
  *  1. decode through the JDK sampled-audio registry, requiring PCM16
  *     signed little-endian mono (the layout `AudioInputStream.read`
  *     yields for WAV) — the same guard as Media's audio decode;
  *  2. split the n samples into 65 equal time frames: sample i belongs
  *     to frame i·65 / n (integer division — the convention the DuckDB
  *     oracle replicates), mirroring ImageDHash's x·9 / w block rule;
  *  3. per-frame energy = Σ|sample| plus the frame's sample count;
  *  4. bit f (f = 0..63) is set iff frame f+1 is louder than frame f
  *     in MEAN energy, compared by exact integer cross-multiplication:
  *     sum(f+1)·cnt(f) > sum(f)·cnt(f+1) — 64 neighbor comparisons,
  *     like dHash's horizontal differences.
  *
  * Comparing neighbor means makes the fingerprint invariant under
  * global gain (both cross-products scale by the square of the gain)
  * and under integer resampling by sample replication (when frame
  * boundaries align — guaranteed whenever n is a multiple of 65, which
  * the synthetic corpus arranges exactly as ImageDedup sizes rasters to
  * its grid); lossless container re-encodes are a no-op on the PCM.
  * A localized edit moves one frame's energy → flips at most the 2
  * comparison bits touching that frame → small hamming distance,
  * caught by the banded join in [[graft.ops.AudioDedup]].
  *
  * Exactness bound: the cross-products stay inside a signed 64-bit
  * integer for n < 2^24 samples (≈ 35 min at 8 kHz; sum ≤ 32767·n,
  * cnt ≤ n). The bound is ENFORCED — a longer clip returns null
  * rather than a silently-overflowed garbage fingerprint. Corpus-scale
  * clips chunk upstream — the same "clip, then fingerprint" contract
  * real audio dedup uses.
  *
  * Returns NULL for payloads the decoder rejects (unknown container,
  * non-PCM16 / stereo / big-endian), for clips shorter than 65
  * samples (an empty frame would make the mean undefined), and for
  * clips at or beyond [[MaxSamples]] — the same declared-fallback
  * contract as [[ImageDHash]], visible instead of silently hashing
  * garbage.
  */
object AudioFingerprintUtil {
  /** 65 frames → 64 neighbor-delta bits. */
  val Frames = 65
  /** Exactness ceiling: sums(f+1)·cnts(f) ≤ 32767·n·n overflows Long at
    * n ≥ 2^24 — clips that long hit the null fallback, not a wrong hash.
    */
  val MaxSamples: Int = 1 << 24

  def compute(payload: Array[Byte]): java.lang.Long = {
    val samples =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
            fmt.isBigEndian ||
            fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) null
        else ais.readAllBytes()
      } catch { case _: Exception => null }
    if (samples == null) return null
    val n = samples.length / 2
    if (n < Frames || n >= MaxSamples) return null
    val sums = new Array[Long](Frames)
    val cnts = new Array[Long](Frames)
    var i = 0
    while (i < n) {
      val s = ((samples(2 * i) & 0xff) | (samples(2 * i + 1) << 8)).toShort
      // i * 65 stays far inside Long for any decodable payload
      val f = (i.toLong * Frames / n).toInt
      sums(f) += math.abs(s.toInt)
      cnts(f) += 1
      i += 1
    }
    var hash = 0L
    var f = 0
    while (f < Frames - 1) {
      if (sums(f + 1) * cnts(f) > sums(f) * cnts(f + 1)) hash |= 1L << f
      f += 1
    }
    java.lang.Long.valueOf(hash)
  }
}

case class AudioFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"audio_fingerprint requires binary, got $t")
  }
  override def dataType: DataType = LongType
  // null on undecodable / non-PCM16-mono / sub-frame clips, not only null
  // input
  override def nullable: Boolean = true
  override def prettyName: String = "audio_fingerprint"

  override protected def nullSafeEval(input: Any): Any = {
    val r = AudioFingerprintUtil.compute(input.asInstanceOf[Array[Byte]])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("afp")
      s"""
         |java.lang.Long $tmp = graft.functions.AudioFingerprintUtil.compute($c);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): AudioFingerprint =
    copy(child = newChild)
}

object AudioFingerprint {
  def apply(c: Column): Column =
    GraftBridge.column(AudioFingerprint(GraftBridge.expression(c)))
}
