package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native per-frame perceptual hashes over an encoded AVI payload — the
  * video modality's fingerprint stream for the cross-modal dedup tier:
  * one 64-bit [[ImageDHashUtil]] dHash PER FRAME, in stream order, so
  * clip-level near-dup reduces to set algebra over frame hashes (the
  * standard sampled-frame approach: a re-encoded / trimmed /
  * brightness-shifted / frame-rate-doubled copy shares most of its
  * frame hashes with the original even though no clip-level byte or
  * raster is equal).
  *
  * The container walk accepts exactly the intra-frame AVI subset
  * `graft.ops.Media.tryDecodeVideo` accepts (RIFF chunk grammar with
  * even alignment, strf BITMAPINFOHEADER, '00db'/'00dc' movi frames):
  *  - biCompression = BI_RGB, 24 bpp: raw bottom-up DIB rows (BGR,
  *    4-byte stride), decoded by hand;
  *  - biCompression = 'MJPG': each chunk a complete JPEG through the
  *    JDK ImageIO reader.
  * Per frame, the luma fold and the 9x8 grid fold are the SHARED
  * [[ImageDHashUtil.hashLuma]] — bit-for-bit the image tier's hash, so
  * a video frame and a still export of it fingerprint identically.
  *
  * Returns NULL for containers/codecs outside that subset, rasters
  * smaller than the grid, truncated chunks, or zero frames — the same
  * declared-fallback contract as the other modality decoders. Frames
  * are never null within a returned array.
  */
object VideoFrameHashesUtil {
  private val MJPG = 0x47504a4d
  /** LIST nesting bound for untrusted payloads (real AVIs use 2-3). */
  private val MaxListDepth = 64

  def compute(p: Array[Byte]): Array[Long] =
    try {
      def le32(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
        ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
      def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
      def cc(o: Int): String = new String(p, o, 4, "US-ASCII")
      if (p.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ") return null
      var w = 0; var h = 0; var ok = false; var mjpeg = false
      val hashes = scala.collection.mutable.ArrayBuffer.empty[Long]
      def hashJpegFrame(off: Int, size: Int): Boolean = {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p, off, size))
        if (img == null || img.getWidth != w || img.getHeight != h)
          return false
        hashes += ImageDHashUtil.hashLuma(w, h, (x, y) => {
          val rgb = img.getRGB(x, y)
          (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
        })
        true
      }
      def hashDibFrame(off: Int, size: Int): Boolean = {
        val stride = ((w * 3 + 3) / 4) * 4
        if (size < stride * h) return false
        hashes += ImageDHashUtil.hashLuma(w, h, (x, y) => {
          // bottom-up row order (positive biHeight)
          val row = off + (h - 1 - y) * stride
          val b = p(row + 3 * x) & 0xff
          val g = p(row + 3 * x + 1) & 0xff
          val r = p(row + 3 * x + 2) & 0xff
          (r * 299 + g * 587 + b * 114) / 1000
        })
        true
      }
      // depth-capped: real AVI nests LISTs 2-3 deep; a crafted payload of
      // ~12-byte nested LIST headers would otherwise recurse once per
      // level and overflow the stack (an Error, which the Exception
      // fallback below does NOT catch) — the cap turns such a payload
      // into the declared null fallback instead of a task crash
      def walk(from: Int, to: Int, depth: Int): Boolean = {
        if (depth > MaxListDepth) return false
        var o = from
        while (o + 8 <= to) {
          val id = cc(o)
          val size = le32(o + 4)
          if (size < 0 || o + 8 + size > to) return false
          if (id == "LIST") {
            if (size < 4 || !walk(o + 12, o + 8 + size, depth + 1))
              return false
          } else if (id == "strf") {
            if (size < 40) return false
            val biW = le32(o + 8 + 4); val biH = le32(o + 8 + 8)
            val planes = le16(o + 8 + 12); val bpp = le16(o + 8 + 14)
            val comp = le32(o + 8 + 16)
            if (biW < ImageDHashUtil.GridW || biH < ImageDHashUtil.GridH)
              return false
            if (comp == MJPG) mjpeg = true
            else if (planes != 1 || bpp != 24 || comp != 0) return false
            w = biW; h = biH; ok = true
          } else if (id.endsWith("db") || id.endsWith("dc")) {
            if (!ok) return false
            if (!(if (mjpeg) hashJpegFrame(o + 8, size)
                  else hashDibFrame(o + 8, size))) return false
          }
          o += 8 + size + (size & 1) // even alignment
        }
        true
      }
      if (!walk(12, 12 + le32(4) - 4, 0) || !ok || hashes.isEmpty) null
      else hashes.toArray
    } catch { case _: Exception => null }
}

case class VideoFrameHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"video_frame_hashes requires binary, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null on undecodable containers / unsupported codecs / zero frames,
  // not only null input
  override def nullable: Boolean = true
  override def prettyName: String = "video_frame_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val r = VideoFrameHashesUtil.compute(input.asInstanceOf[Array[Byte]])
    if (r == null) null else new GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("vfh")
      val arrCls = classOf[ArrayData].getName
      val genCls = classOf[GenericArrayData].getName
      s"""
         |long[] $tmp = graft.functions.VideoFrameHashesUtil.compute($c);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ($arrCls) new $genCls($tmp);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): VideoFrameHashes =
    copy(child = newChild)
}

object VideoFrameHashes {
  def apply(c: Column): Column =
    GraftBridge.column(VideoFrameHashes(GraftBridge.expression(c)))
}
