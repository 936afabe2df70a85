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

  test("feature stats aggregate per kind without shuffling payloads") {
    val stats = Media.featureStats(Media.decodeStub(Media.mediaTable(spark, 99)))
    val rows = stats.collect()
    rows.map(_.getAs[String]("kind")).toSeq shouldBe Seq("audio", "image", "video")
    rows.map(_.getAs[Long]("n")).sum shouldBe 99
  }
}
