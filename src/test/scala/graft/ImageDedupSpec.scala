package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.ImageDHashUtil
import graft.ops.ImageDedup

/** Perceptual-hash image dedup: the dHash invariances (re-encode, 2x
  * resize, brightness shift), the small-edit locality bound, the
  * distinct-image separation, the decode-failure contract, and the
  * end-to-end banded pairing.
  */
class ImageDedupSpec extends AnyFunSuite with Matchers with TestSpark {

  private def hashOf(g: Long, v: Int): Long = {
    val h = ImageDHashUtil.compute(ImageDedup.encode(g, v))
    h should not be null
    h.longValue()
  }

  test("re-encoded (PNG->BMP), 2x-resized, brightness-shifted variant " +
      "hashes IDENTICALLY to its base (hamming 0)") {
    (0L until 20L).foreach { g =>
      hashOf(g, 1) shouldBe hashOf(g, 0)
    }
  }

  test("a one-grid-cell patch moves at most the 2 touching comparison " +
      "bits (0 < hamming <= 2 somewhere, never more)") {
    val dists = (0L until ImageDedup.Groups.toLong).map { g =>
      java.lang.Long.bitCount(hashOf(g, 0) ^ hashOf(g, 2))
    }
    dists.foreach(_ should be <= 2)
    // the patch is not a no-op across the corpus
    dists.max should be >= 1
  }

  test("distinct images separate: the unrelated variant sits beyond the " +
      "pairing threshold for every group") {
    (0L until ImageDedup.Groups.toLong).foreach { g =>
      val h3 = hashOf(g, 3)
      Seq(0, 1, 2).foreach { v =>
        java.lang.Long.bitCount(hashOf(g, v) ^ h3) should be >
          ImageDedup.ImgHamMax
      }
    }
  }

  test("undecodable payloads and sub-grid rasters hash to null, not " +
      "garbage") {
    ImageDHashUtil.compute(Array[Byte](1, 2, 3, 4)) shouldBe null
    // a real 4x4 PNG: decodes fine but is smaller than the 9x8 grid
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    ImageDHashUtil.compute(bos.toByteArray) shouldBe null
  }

  test("imageDups finds every engineered variant pair (guaranteed: all " +
      "are within the hamming<=3 banding pigeonhole) and nothing across " +
      "groups") {
    val pairs = ImageDedup.imageDups(ImageDedup.imageTable(spark, 12))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPair = pairs.map(p => (p._1, p._2)).toSet
    (0L until 12L).foreach { g =>
      byPair should contain((4 * g, 4 * g + 1)) // re-encode/resize/shift
      byPair should contain((4 * g, 4 * g + 2)) // patched
      byPair should contain((4 * g + 1, 4 * g + 2))
    }
    pairs.foreach { case (a, b, d) =>
      a / 4 shouldBe b / 4 // no cross-group pair at this corpus size
      d should be <= ImageDedup.ImgHamMax.toLong
    }
    // the v0-v1 pair is exact-hash (distance 0)
    pairs.filter(p => p._1 % 4 == 0 && p._2 == p._1 + 1)
      .foreach(_._3 shouldBe 0L)
  }

  test("incremental tier: re-ingested assets pair with exactly their " +
      "group's near-dup variants, genuinely new images with nothing") {
    val n = 12
    val hashes = ImageDedup.hashRows(ImageDedup.imageTable(spark, n))
      .unionByName(
        ImageDedup.hashRows(ImageDedup.incrementTable(spark, n)))
    val pairs = ImageDedup.imageDupsIncremental(hashes)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    (0L until n.toLong).foreach { g =>
      val newId = ImageDedup.NewMediaBase + g
      val got = pairs.filter(_._2 == newId).map(_._1).sorted
      if (g % 3 == 0) {
        // the +IncShift BMP re-encode is fingerprint-identical to
        // v0/v1 and within the one-cell patch of v2 — and NOTHING else
        got shouldBe Seq(4 * g, 4 * g + 1, 4 * g + 2)
        pairs.filter(p => p._2 == newId && p._1 != 4 * g + 2)
          .foreach(_._3 shouldBe 0L)
      } else {
        got shouldBe empty // new images (g%3==1) and absent ids (g%3==2)
      }
    }
    // no index-vs-index pair leaks into the incremental output
    pairs.foreach(_._2 should be >= ImageDedup.NewMediaBase)
  }
}
