package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.AudioFingerprintUtil
import graft.ops.AudioDedup

/** Acoustic-fingerprint audio dedup: the energy-delta invariances (2x
  * gain, 2x sample-duplication resample, container re-encode — all in
  * variant 1), the one-frame splice locality bound, the distinct-clip
  * separation, the decode-failure contract, and the end-to-end banded
  * pairing.
  */
class AudioDedupSpec extends AnyFunSuite with Matchers with TestSpark {

  private def fpOf(g: Long, v: Int): Long = {
    val h = AudioFingerprintUtil.compute(AudioDedup.encode(g, v))
    h should not be null
    h.longValue()
  }

  test("2x-gain, 2x-duplicated, re-encoded variant fingerprints " +
      "IDENTICALLY to its base (hamming 0)") {
    (0L until 20L).foreach { g =>
      fpOf(g, 1) shouldBe fpOf(g, 0)
    }
  }

  test("a one-frame splice moves at most the 2 touching comparison " +
      "bits (0 < hamming <= 2 somewhere, never more)") {
    val dists = (0L until AudioDedup.Groups.toLong).map { g =>
      java.lang.Long.bitCount(fpOf(g, 0) ^ fpOf(g, 2))
    }
    dists.foreach(_ should be <= 2)
    // the splice is not a no-op across the corpus
    dists.max should be >= 1
  }

  test("distinct clips separate: the unrelated variant sits beyond the " +
      "pairing threshold for every group") {
    (0L until AudioDedup.Groups.toLong).foreach { g =>
      val h3 = fpOf(g, 3)
      Seq(0, 1, 2).foreach { v =>
        java.lang.Long.bitCount(fpOf(g, v) ^ h3) should be >
          AudioDedup.AudHamMax
      }
    }
  }

  test("undecodable payloads, non-PCM16-mono streams, and sub-frame " +
      "clips fingerprint to null, not garbage") {
    AudioFingerprintUtil.compute(Array[Byte](1, 2, 3, 4)) shouldBe null
    // a real stereo WAV: decodes fine but violates the mono contract
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val data = new Array[Byte](400)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, 100L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    AudioFingerprintUtil.compute(bos.toByteArray) shouldBe null
    // a real mono PCM16 WAV shorter than the 65-frame grid
    val fmt1 = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais1 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](64 * 2)), fmt1, 64L)
    val bos1 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais1,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos1)
    AudioFingerprintUtil.compute(bos1.toByteArray) shouldBe null
  }

  test("audioDups finds every engineered variant pair (guaranteed: all " +
      "are within the hamming<=3 banding pigeonhole) and nothing across " +
      "groups") {
    val pairs = AudioDedup.audioDups(AudioDedup.audioTable(spark, 12))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPair = pairs.map(p => (p._1, p._2)).toSet
    (0L until 12L).foreach { g =>
      byPair should contain((4 * g, 4 * g + 1)) // gain/resample/re-encode
      byPair should contain((4 * g, 4 * g + 2)) // spliced
      byPair should contain((4 * g + 1, 4 * g + 2))
    }
    pairs.foreach { case (a, b, d) =>
      a / 4 shouldBe b / 4 // no cross-group pair at this corpus size
      d should be <= AudioDedup.AudHamMax.toLong
    }
    // the v0-v1 pair is exact-fingerprint (distance 0)
    pairs.filter(p => p._1 % 4 == 0 && p._2 == p._1 + 1)
      .foreach(_._3 shouldBe 0L)
  }

  test("incremental tier: re-uploaded clips at 3x gain pair with " +
      "exactly their group's variants, genuinely new clips with nothing") {
    val n = 12
    val hashes = AudioDedup.hashRows(AudioDedup.audioTable(spark, n))
      .unionByName(
        AudioDedup.hashRows(AudioDedup.incrementTable(spark, n)))
    val pairs = AudioDedup.audioDupsIncremental(hashes)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    (0L until n.toLong).foreach { g =>
      val newId = AudioDedup.NewMediaBase + g
      val got = pairs.filter(_._2 == newId).map(_._1).sorted
      if (g % 3 == 0) {
        got shouldBe Seq(4 * g, 4 * g + 1, 4 * g + 2)
        pairs.filter(p => p._2 == newId && p._1 != 4 * g + 2)
          .foreach(_._3 shouldBe 0L) // gain-invariance: exact vs v0/v1
      } else {
        got shouldBe empty
      }
    }
    pairs.foreach(_._2 should be >= AudioDedup.NewMediaBase)
  }
}
