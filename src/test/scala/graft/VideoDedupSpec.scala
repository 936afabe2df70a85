package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.{ImageDHashUtil, VideoFrameHashesUtil}
import graft.ops.{Media, VideoDedup}

/** Frame-set video dedup: the per-frame hash invariances (frame-rate
  * doubling + brightness shift), trim containment, distinct-clip
  * separation, the image-tier hash identity (a video frame and a still
  * of it fingerprint identically), the decode-failure contract, and the
  * end-to-end inverted-index pairing.
  */
class VideoDedupSpec extends AnyFunSuite with Matchers with TestSpark {

  private def framesOf(g: Long, v: Int): Array[Long] = {
    val hs = VideoFrameHashesUtil.compute(VideoDedup.encode(g, v))
    hs should not be null
    hs
  }

  test("frame-rate-doubled + brightness-shifted variant has the SAME " +
      "distinct frame-hash set as its base (each hash exactly twice)") {
    (0L until 20L).foreach { g =>
      val f0 = framesOf(g, 0)
      val f1 = framesOf(g, 1)
      f1.length shouldBe 2 * f0.length
      f1.toSet shouldBe f0.toSet
      f1.grouped(2).foreach { p => p(0) shouldBe p(1) }
    }
  }

  test("every clip's frame hashes are pairwise distinct (the corpus " +
      "premise that makes |shared| = intersection size)") {
    (0L until VideoDedup.Groups.toLong).foreach { g =>
      Seq(0, 2, 3).foreach { v =>
        val f = framesOf(g, v)
        f.toSet.size shouldBe f.length
      }
    }
  }

  test("the trimmed variant's set is contained in the base's") {
    (0L until VideoDedup.Groups.toLong).foreach { g =>
      val f0 = framesOf(g, 0).toSet
      val f2 = framesOf(g, 2).toSet
      f2.size shouldBe VideoDedup.NFrames - VideoDedup.TrimStart
      f2.subsetOf(f0) shouldBe true
    }
  }

  test("a video frame hashes IDENTICALLY to the image tier's hash of " +
      "the same raster (shared grid fold)") {
    val g = 7L
    val t = 3
    // hash the frame raster through the image-side fold directly
    val direct = ImageDHashUtil.hashLuma(VideoDedup.BaseW, VideoDedup.BaseH,
      (x, y) => VideoDedup.luma(g, 0, t, x, y))
    framesOf(g, 0)(t) shouldBe direct
  }

  test("undecodable payloads, inter-frame codecs, and sub-grid rasters " +
      "return null, not garbage") {
    VideoFrameHashesUtil.compute(Array[Byte](1, 2, 3, 4)) shouldBe null
    // an MJPEG AVI decodes (intra-frame); a raster smaller than the
    // 9x8 grid must not
    val tiny = Media.encodeAviLuma(4, 4, Array((_, _) => 100))
    VideoFrameHashesUtil.compute(tiny) shouldBe null
  }

  test("MJPEG AVI goes through the JPEG branch and yields per-frame " +
      "hashes") {
    val payload = Media.encodeMjpegAvi(36, 32, Array(40, 200))
    val hs = VideoFrameHashesUtil.compute(payload)
    hs should not be null
    hs.length shouldBe 2
  }

  test("videoDups finds every engineered variant pair at containment " +
      "1.0 and nothing across groups") {
    val pairs = VideoDedup.videoDups(VideoDedup.videoTable(spark, 12))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byPair = pairs.map(p => (p._1, p._2)).toSet
    (0L until 12L).foreach { g =>
      byPair should contain((4 * g, 4 * g + 1)) // rate-doubled + shifted
      byPair should contain((4 * g, 4 * g + 2)) // trimmed excerpt
      byPair should contain((4 * g + 1, 4 * g + 2))
    }
    pairs.foreach { case (a, b, ov) =>
      a / 4 shouldBe b / 4 // no cross-group pair at this corpus size
      ov shouldBe 1.0 // every engineered relation is full containment
    }
  }

  test("incremental tier: re-ingested excerpts pair with exactly their " +
      "group's near-dup variants at containment 1.0, genuinely new " +
      "clips with nothing, and no index-vs-index pair leaks") {
    val n = 12
    val hashes = VideoDedup.hashRows(VideoDedup.videoTable(spark, n))
      .unionByName(
        VideoDedup.hashRows(VideoDedup.incrementTable(spark, n)))
    val pairs = VideoDedup.videoDupsIncremental(hashes)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    (0L until n.toLong).foreach { g =>
      val newId = VideoDedup.NewMediaBase + g
      val got = pairs.filter(_._2 == newId).map(_._1).sorted
      if (g % 3 == 0) {
        // the trimmed+brightened re-encode's frame set equals the
        // trimmed variant's — contained in v0/v1's set, identical to
        // v2's — and pairs with NOTHING else
        got shouldBe Seq(4 * g, 4 * g + 1, 4 * g + 2)
        pairs.filter(_._2 == newId).foreach(_._3 shouldBe 1.0)
      } else {
        got shouldBe empty // new clips (g%3==1) and absent ids (g%3==2)
      }
    }
    pairs.foreach(_._2 should be >= VideoDedup.NewMediaBase)
  }

  test("incremental result equals the full-rebuild pairing restricted " +
      "to (index, increment) pairs") {
    val n = 9
    val standing = VideoDedup.videoTable(spark, n)
    val incr = VideoDedup.incrementTable(spark, n)
    val incremental = VideoDedup.videoDupsIncremental(
        VideoDedup.hashRows(standing)
          .unionByName(VideoDedup.hashRows(incr)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // full rebuild: run the batch operator over standing ∪ increment,
    // then keep only pairs crossing the id boundary (vid_a < base <=
    // vid_b under the operator's a<b ordering)
    val rebuilt = VideoDedup.videoDups(standing.unionByName(incr))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) =>
        a < VideoDedup.NewMediaBase && b >= VideoDedup.NewMediaBase
      }.toSet
    incremental shouldBe rebuilt
  }
}
