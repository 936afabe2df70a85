package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Media

/** Multimodal plumbing: deterministic synthetic media, partition-batched
  * decode (REAL ImageIO images, REAL javax.sound WAV audio, REAL pure-JDK RIFF/AVI raw-DIB video; stub only for unknown codecs),
  * payload-free aggregation.
  */
class MediaSpec extends AnyFunSuite with Matchers with TestSpark {

  test("decode is deterministic and schema-stable; images REALLY decode") {
    val a = Media.decode(Media.mediaTable(spark, 50)).collect()
      .sortBy(_.media_id)
    val b = Media.decode(Media.mediaTable(spark, 50)).collect()
      .sortBy(_.media_id)
    a.map(_.checksum).toSeq shouldBe b.map(_.checksum).toSeq
    a.length shouldBe 50
    a.foreach { f =>
      val i = f.media_id
      f.kind match {
        case "image" =>
          f.mean_byte should (be >= 0.0 and be <= 255.0)
          f.frames_sampled shouldBe 1
          // ImageIO round-trip recovered the generator's raster: decoded
          // dims match the metadata formula, and the constant-gray mean
          // luminance equals g(i) EXACTLY (integer luma of (g,g,g) is g)
          f.decoded_w shouldBe 16 + (i % 8).toInt * 4
          f.decoded_h shouldBe 16 + (i % 6).toInt * 4
          f.mean_byte shouldBe ((i * 37) % 256).toDouble
        case "audio" =>
          // javax.sound round-trip recovered the generator's samples:
          // count matches n(i), constant amplitude means |mean| = a(i)
          f.frames_sampled should be >= 2
          f.decoded_w shouldBe 160 + (i % 5).toInt * 80
          f.decoded_h shouldBe 1
          f.mean_byte shouldBe ((i * 53) % 1000).toDouble
          f.n_bytes shouldBe 44 + 2 * f.decoded_w // RIFF header + PCM16
        case _ =>
          // the RIFF/AVI walker recovered the generator's raw DIB frames:
          // true frame count, frame dims, and per-frame constant-gray
          // means averaging to Σf g(i,f) / nF exactly
          val nF = 2 + (i % 4).toInt
          f.frames_sampled shouldBe nF
          f.decoded_w shouldBe 8 + (i % 5).toInt * 4
          f.decoded_h shouldBe 8 + (i % 7).toInt * 2
          val px = f.decoded_w.toLong * f.decoded_h
          val lumaSum = (0 until nF).map(fr => ((i * 37 + fr * 11) % 256) * px).sum
          f.mean_byte shouldBe lumaSum.toDouble / (px * nF)
      }
    }
  }

  test("audio decode is sample-true: hand-built WAV with known samples, " +
      "and junk audio bytes fall back flagged") {
    import spark.implicits._
    // 4 samples: 100, -100, 300, 0 -> mean |s| = 125.0, digest over order
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val samples = Seq[Short](100, -100, 300, 0)
    val data = samples.flatMap(s =>
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.size.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val records = Seq(
      Media.MediaRecord(1L, "audio", bos.toByteArray, 0, 0, 1000),
      Media.MediaRecord(2L, "audio", Array[Byte](9, 9, 9, 9), 0, 0, 1000))
      .toDS()
    val out = Media.decode(records).collect().map(f => f.media_id -> f).toMap
    val real = out(1L)
    real.decoded_w shouldBe 4
    real.decoded_h shouldBe 1
    real.mean_byte shouldBe 125.0
    real.checksum shouldBe (((100L * 31 - 100) * 31 + 300) * 31 + 0)
    val fb = out(2L)
    fb.decoded_w shouldBe 0
    fb.decoded_h shouldBe 0
    fb.n_bytes shouldBe 4
  }

  test("image decode is pixel-true: hand-computed stats on a 2x2 PNG, " +
      "and an undecodable payload falls back flagged") {
    import spark.implicits._
    // four distinct known pixels; luminance = (299r + 587g + 114b) / 1000
    // integer-divided: (255,0,0)->76, (0,255,0)->149, (0,0,255)->29,
    // (10,20,30)->18 (2990+11740+3420 = 18150 -> 18)
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, (10 << 16) | (20 << 8) | 30)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val records = Seq(
      Media.MediaRecord(1L, "image", bos.toByteArray, 2, 2, 0),
      Media.MediaRecord(2L, "image", Array[Byte](1, 2, 3, 4), 9, 9, 0)).toDS()
    val out = Media.decode(records).collect().map(f => f.media_id -> f).toMap
    val real = out(1L)
    real.decoded_w shouldBe 2
    real.decoded_h shouldBe 2
    // raster order (0,0),(1,0),(0,1),(1,1): mean = (76+149+29+18)/4
    real.mean_byte shouldBe 68.0
    // polynomial digest over the same order: ((76*31+149)*31+29)*31+18
    real.checksum shouldBe (((76L * 31 + 149) * 31 + 29) * 31 + 18)
    // 4 junk bytes are not a PNG: stub features, zero decoded dims
    val fb = out(2L)
    fb.decoded_w shouldBe 0
    fb.decoded_h shouldBe 0
    fb.n_bytes shouldBe 4
  }

  test("video decode is frame-true: hand-built 2-frame AVI with known " +
      "pixels, and junk video bytes fall back flagged") {
    import spark.implicits._
    // 2 frames of 2x1 gray rasters (gray 10, gray 200): stride pads 2*3=6
    // to 8 bytes, luma of (g,g,g) is exactly g
    val avi = Media.encodeAvi(2, 1, Array(10, 200))
    val records = Seq(
      Media.MediaRecord(1L, "video", avi, 2, 1, 1000),
      Media.MediaRecord(2L, "video", Array[Byte](7, 7, 7, 7), 9, 9, 1000))
      .toDS()
    val out = Media.decode(records).collect().map(f => f.media_id -> f).toMap
    val real = out(1L)
    real.decoded_w shouldBe 2
    real.decoded_h shouldBe 1
    real.frames_sampled shouldBe 2 // TRUE decoded count, not duration/500
    real.mean_byte shouldBe 105.0 // (10 + 10 + 200 + 200) / 4
    // digest in frame-then-raster order: ((10*31+10)*31+200)*31+200
    real.checksum shouldBe (((10L * 31 + 10) * 31 + 200) * 31 + 200)
    real.n_bytes shouldBe avi.length
    val fb = out(2L)
    fb.decoded_w shouldBe 0 // unknown codec: flagged fallback, not silent
    fb.decoded_h shouldBe 0
    fb.n_bytes shouldBe 4
  }

  test("MJPEG video decode is frame-true: fabricated MJPG AVI decodes " +
      "dims, frame count, and per-pixel luminance through ImageIO") {
    import spark.implicits._
    val w = 16; val h = 8
    val grays = Array(10, 200, 97)
    val avi = Media.encodeMjpegAvi(w, h, grays)
    // expectation derived by decoding the SAME JPEG bytes directly:
    // JPEG quantizes the DC coefficient, so decoded gray may differ
    // from the requested one — frame-true means matching the decoder,
    // not the generator request
    var expCks = 0L; var expSum = 0L
    grays.foreach { g =>
      val img0 = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      for (y <- 0 until h; x <- 0 until w) img0.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img0, "jpg", bos)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        val lum = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
          (p & 0xff) * 114) / 1000
        expCks = expCks * 31 + lum
        expSum += lum
      }
    }
    val records = Seq(Media.MediaRecord(1L, "video", avi, w, h, 1500)).toDS()
    val out = Media.decode(records).collect().head
    out.decoded_w shouldBe w
    out.decoded_h shouldBe h
    out.frames_sampled shouldBe grays.length // TRUE decoded frame count
    out.checksum shouldBe expCks
    out.mean_byte shouldBe expSum.toDouble / (w.toLong * h * grays.length)
    out.n_bytes shouldBe avi.length
  }

  test("MJPEG AVI whose frames contradict the declared stream dims " +
      "falls back flagged, not silently") {
    import spark.implicits._
    val avi = Media.encodeMjpegAvi(8, 8, Array(50, 60))
    // corrupt the declared dims in strh rcFrame AND strf biWidth/biHeight:
    // easier — rebuild a valid 8x8 MJPEG AVI, then patch strf biWidth to 4
    // (offset: find 'strf' and patch biWidth at strf+8+4)
    val idx = {
      var i = -1
      var o = 0
      while (i < 0 && o + 4 <= avi.length) {
        if (avi(o) == 's' && avi(o + 1) == 't' && avi(o + 2) == 'r' &&
          avi(o + 3) == 'f') i = o
        o += 1
      }
      i
    }
    idx should be > 0
    val bad = avi.clone()
    bad(idx + 8 + 4) = 4 // biWidth 8 -> 4; frames still decode as 8x8
    val out = Media.decode(
      Seq(Media.MediaRecord(1L, "video", bad, 8, 8, 1000)).toDS())
      .collect().head
    out.decoded_w shouldBe 0 // dims lie -> flagged fallback
    out.decoded_h shouldBe 0
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
