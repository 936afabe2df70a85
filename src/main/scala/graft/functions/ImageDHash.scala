package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native 64-bit perceptual difference hash (dHash) over an encoded
  * image payload — the per-image fingerprint of the cross-modal dedup
  * tier (reference scope: the engine dedups text at every granularity;
  * this is the same near-dup contract for the image modality, built on
  * the already-real ImageIO decode of `graft.ops.Media`).
  *
  * Pipeline per row, one codegen'd call, no UDF serde:
  *
  *  1. decode the payload through the JDK ImageIO registry (PNG / JPEG /
  *     GIF / BMP — whatever readers the JVM ships);
  *  2. integer luma per pixel — (r·299 + g·587 + b·114) / 1000, the
  *     exact arithmetic of Media.rasterStats, so a gray (g,g,g) pixel
  *     contributes g;
  *  3. block-mean downsample onto a 9×8 grid: pixel (x, y) belongs to
  *     cell (x·9 / w, y·8 / h) (integer division — the convention the
  *     DuckDB oracle replicates verbatim), cell value = Σluma / #pixels
  *     (integer division);
  *  4. bit k = gy·8 + gx set iff grid[gx+1][gy] > grid[gx][gy] — 8
  *     horizontal differences × 8 rows = 64 bits.
  *
  * dHash compares NEIGHBOR means, so the hash is invariant under global
  * brightness shift (all differences move together) and under pixel
  * replication (a 2×-doubled raster's blocks average the same source
  * pixels: ⌊4s/64⌋ = ⌊s/16⌋), and re-encoding between lossless codecs
  * (PNG ↔ BMP) is a byte-level no-op on the raster — the three variant
  * axes ImageDedupSpec pins at hamming 0. Lossy re-encodes and small
  * edits move few grid cells → small hamming distance, caught by the
  * banded join in [[graft.ops.ImageDedup]].
  *
  * Returns NULL for payloads no registered reader accepts and for
  * rasters smaller than the grid (w < 9 or h < 8) — the same
  * declared-fallback contract as Media.decode, visible instead of
  * silently hashing garbage.
  */
object ImageDHashUtil {
  val GridW = 9
  val GridH = 8

  /** The grid fold over an arbitrary luma raster — steps 3-4 above,
    * shared verbatim with the per-frame hashing of
    * [[VideoFrameHashesUtil]] so the image and video modalities cannot
    * diverge on the block-mean convention or bit packing. Caller
    * guarantees w >= GridW and h >= GridH.
    */
  def hashLuma(w: Int, h: Int, lum: (Int, Int) => Int): Long = {
    val sums = new Array[Long](GridW * GridH)
    val cnts = new Array[Long](GridW * GridH)
    var y = 0
    while (y < h) {
      val gy = y * GridH / h
      var x = 0
      while (x < w) {
        val gx = x * GridW / w
        val c = gy * GridW + gx
        sums(c) += lum(x, y)
        cnts(c) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var gy = 0
    while (gy < GridH) {
      var gx = 0
      while (gx < GridW - 1) {
        val a = sums(gy * GridW + gx) / cnts(gy * GridW + gx)
        val b = sums(gy * GridW + gx + 1) / cnts(gy * GridW + gx + 1)
        if (b > a) hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  def compute(payload: Array[Byte]): java.lang.Long = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null || img.getWidth < GridW || img.getHeight < GridH)
      return null
    val hash = hashLuma(img.getWidth, img.getHeight, (x, y) => {
      val rgb = img.getRGB(x, y)
      (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
        (rgb & 0xff) * 114) / 1000
    })
    java.lang.Long.valueOf(hash)
  }
}

case class ImageDHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"image_dhash requires binary, got $t")
  }
  override def dataType: DataType = LongType
  // null on undecodable payloads / sub-grid rasters, not only null input
  override def nullable: Boolean = true
  override def prettyName: String = "image_dhash"

  override protected def nullSafeEval(input: Any): Any = {
    val r = ImageDHashUtil.compute(input.asInstanceOf[Array[Byte]])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("dhash")
      s"""
         |java.lang.Long $tmp = graft.functions.ImageDHashUtil.compute($c);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ImageDHash =
    copy(child = newChild)
}

object ImageDHash {
  def apply(c: Column): Column =
    GraftBridge.column(ImageDHash(GraftBridge.expression(c)))
}
