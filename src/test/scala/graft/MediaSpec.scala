package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Media

/** Multimodal plumbing: deterministic synthetic media, partition-batched
  * stubbed decode, payload-free aggregation.
  */
class MediaSpec extends AnyFunSuite with Matchers with TestSpark {

  test("decode is deterministic and schema-stable") {
    val a = Media.decodeStub(Media.mediaTable(spark, 50)).collect()
      .sortBy(_.media_id)
    val b = Media.decodeStub(Media.mediaTable(spark, 50)).collect()
      .sortBy(_.media_id)
    a.map(_.checksum).toSeq shouldBe b.map(_.checksum).toSeq
    a.length shouldBe 50
    a.foreach { f =>
      f.n_bytes % 16 shouldBe 0 // payload = whole md5 blocks
      f.mean_byte should (be >= 0.0 and be <= 255.0)
      if (f.kind == "image") f.frames_sampled shouldBe 1
      else f.frames_sampled should be >= 2
    }
  }

  test("resize fits within maxDim preserving aspect; small media " +
      "pass through untouched") {
    val in = Media.mediaTable(spark, 80)
    val out = Media.resizeStub(in, maxDim = 128).collect()
      .map(m => m.media_id -> m).toMap
    in.collect().foreach { m =>
      val r = out(m.media_id)
      val big = math.max(m.width, m.height)
      if (big <= 128) {
        r.width shouldBe m.width
        r.height shouldBe m.height
        r.payload.toSeq shouldBe m.payload.toSeq // identity, no re-encode
      } else {
        math.max(r.width, r.height) should be <= 128
        // aspect preserved via exact floor scaling
        r.width shouldBe math.max(1, m.width * 128 / big)
        r.height shouldBe math.max(1, m.height * 128 / big)
        r.payload.length should be <= m.payload.length
      }
      // metadata untouched by the scaler
      r.kind shouldBe m.kind
      r.duration_ms shouldBe m.duration_ms
    }
    // resized output feeds the same decode plumbing unchanged
    Media.decodeStub(Media.resizeStub(in, 128)).count() shouldBe 80
  }

  test("resize never grows a payload, even below the 16-byte floor") {
    import spark.implicits._
    // 8-byte payload on an oversized image: the stub's 16-byte floor must
    // clamp to the source length, not pad zeros past it
    val tiny = Seq(
      Media.MediaRecord(1L, "image", Array.fill[Byte](8)(7), 512, 512, 0),
      Media.MediaRecord(2L, "image", Array.fill[Byte](100)(7), 512, 256, 0))
      .toDS()
    val out = Media.resizeStub(tiny, maxDim = 128).collect()
      .map(m => m.media_id -> m).toMap
    out(1L).payload.length shouldBe 8
    out(1L).payload.toSeq shouldBe Seq.fill[Byte](8)(7)
    out(2L).payload.length should be <= 100
  }

  test("feature stats aggregate per kind without shuffling payloads") {
    val stats = Media.featureStats(Media.decodeStub(Media.mediaTable(spark, 99)))
    val rows = stats.collect()
    rows.map(_.getAs[String]("kind")).toSeq shouldBe Seq("audio", "image", "video")
    rows.map(_.getAs[Long]("n")).sum shouldBe 99
  }
}
