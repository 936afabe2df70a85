package graft.ops

import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * Image decode is REAL: payloads are PNG-encoded rasters and [[decode]]
  * runs them through JDK `javax.imageio` inside the partition-batched pass,
  * emitting decoded width/height and mean luminance computed over the
  * PIXELS (not the encoded bytes). Audio decode is REAL too: payloads are
  * WAV (RIFF) PCM16 mono and go through JDK `javax.sound.sampled`,
  * emitting the decoded sample count and mean |amplitude| computed over
  * the SAMPLES. Video decode stays STUBBED (the JDK ships no video
  * codec): `fakeDecode` derives deterministic features from the payload
  * bytes, and the same fallback catches any image/audio payload the
  * decoder rejects (unsupported codec / corrupt file — flagged by
  * decoded_w = decoded_h = 0). Everything around the stub — schema,
  * partition-parallel batch iteration, feature struct shape, downstream
  * aggregation — is the production shape: swap `fakeDecode` for an
  * FFmpeg-equivalent, keep the signature.
  *
  * Scale notes: media payloads dominate row size, so the pipeline keeps the
  * binary column out of every shuffle (features are extracted in a
  * mapPartitions pass BEFORE any wide operation, and only scalar features
  * flow onward). Partition sizing comes from
  * spark.sql.files.maxPartitionBytes on a real media lake.
  */
object Media {

  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int, // typed metadata travels beside the blob
      height: Int,
      duration_ms: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      checksum: Long, // decoded-content digest (raster/samples); payload digest else
      mean_byte: Double, // mean pixel luminance (image) / mean |sample| (audio); payload mean else
      frames_sampled: Int,
      decoded_w: Int, // image: decoded width; audio: decoded sample count; 0 = codec fell back
      decoded_h: Int) // image: decoded height; audio: 1; 0 = codec fell back

  /** Deterministic synthetic media table. Images carry REAL PNG payloads:
    * a constant-gray w(i) x h(i) raster with gray g(i) = (i * 37) % 256 —
    * constant so the decoded mean luminance equals g(i) EXACTLY (integer
    * luma of (g,g,g) is g), keeping the q_media_features oracle literals
    * derivable from the generator arithmetic rather than from any encoder.
    * Audio carries REAL WAV payloads on the same principle: PCM16 mono
    * 8 kHz, n(i) = 160 + (i % 5) * 80 samples all at constant amplitude
    * a(i) = (i * 53) % 1000 — so the decoded mean |sample| equals a(i)
    * exactly and the aggregate stays generator-derivable. Video payloads
    * remain repeated md5 bytes of the id (stable across runs and engines).
    */
  def mediaTable(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { i =>
      (i % 3) match {
        case 0 =>
          val w = 16 + (i % 8).toInt * 4
          val h = 16 + (i % 6).toInt * 4
          val g = ((i * 37) % 256).toInt
          MediaRecord(i, "image", encodePng(w, h, g), w, h, 0)
        case 1 =>
          val nSamples = 160 + (i % 5).toInt * 80
          val amp = ((i * 53) % 1000).toInt
          MediaRecord(i, "audio", encodeWav(nSamples, amp),
            64 + (i % 64).toInt * 8, 64 + (i % 48).toInt * 8,
            1000 + (i % 60).toInt * 500)
        case _ =>
          val seed = java.security.MessageDigest.getInstance("MD5")
            .digest(s"media:$i".getBytes("UTF-8"))
          val payload = Array.fill((i % 7).toInt + 1)(seed).flatten
          MediaRecord(i, "video", payload, 64 + (i % 64).toInt * 8,
            64 + (i % 48).toInt * 8, 1000 + (i % 60).toInt * 500)
      }
    }
  }

  /** RIFF/WAV PCM16 mono 8 kHz, every sample the same little-endian
    * `amp` — the audio analog of the constant-gray PNG.
    */
  private def encodeWav(nSamples: Int, amp: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](nSamples * 2)
    var j = 0
    while (j < nSamples) {
      data(2 * j) = (amp & 0xff).toByte
      data(2 * j + 1) = ((amp >> 8) & 0xff).toByte
      j += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def encodePng(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Partition-batched feature extraction. Images go through the REAL
    * JDK ImageIO decode (PNG/JPEG/GIF/BMP — whatever the JVM's reader
    * registry supports); audio through the REAL JDK sampled-audio decode
    * (WAV/AIFF/AU PCM); everything else, plus any payload the decoder
    * rejects, takes the deterministic byte-level stub with
    * decoded_w = decoded_h = 0 marking the fallback.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here (the JDK decoder registries
      // are JVM-global and thread-safe; an FFmpeg context would be created
      // once per partition at this point)
      it.map { m =>
        def fallback = {
          val fake = fakeDecode(m.payload)
          MediaFeatures(m.media_id, m.kind, m.payload.length, fake._1,
            fake._2, frameCount(m), 0, 0)
        }
        m.kind match {
          case "image" => tryDecodeImage(m.payload) match {
            case Some(bi) =>
              val (cks, mean) = rasterStats(bi)
              MediaFeatures(m.media_id, m.kind, m.payload.length, cks, mean,
                frameCount(m), bi.getWidth, bi.getHeight)
            case None => fallback
          }
          case "audio" => tryDecodeAudio(m.payload) match {
            case Some((cks, meanAbs, nSamples)) =>
              MediaFeatures(m.media_id, m.kind, m.payload.length, cks,
                meanAbs, frameCount(m), nSamples, 1)
            case None => fallback
          }
          case _ => fallback
        }
      }
    }
  }

  /** REAL JDK audio decode: parse the container, require PCM16 LE (the
    * signed 16-bit little-endian layout `AudioInputStream.read` yields for
    * WAV), fold the SAMPLES into a digest + mean |amplitude|. Sample count
    * lands in decoded_w (decoded_h = 1), so a silent fallback is visible
    * in total_px exactly like an image decode failure.
    */
  private def tryDecodeAudio(
      payload: Array[Byte]): Option[(Long, Double, Int)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.isBigEndian ||
          fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
      else {
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        var cks = 0L
        var sumAbs = 0L
        var j = 0
        while (j < n) {
          val s = ((bytes(2 * j) & 0xff) | (bytes(2 * j + 1) << 8)).toShort
          cks = cks * 31 + s
          sumAbs += math.abs(s.toInt)
          j += 1
        }
        Some((cks, if (n == 0) 0.0 else sumAbs.toDouble / n, n))
      }
    } catch { case _: Exception => None }

  /** Back-compat alias from the rounds where image decode was stubbed. */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    decode(media)

  private def tryDecodeImage(payload: Array[Byte]): Option[BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** Decoded-content digest + mean over the raster. Per-pixel luminance is
    * integer luma (r*299 + g*587 + b*114) / 1000 — for a gray pixel
    * (g,g,g) that is exactly g, which is what keeps the synthetic table's
    * aggregate derivable by arithmetic. The mean divides two exact
    * integers (sum and pixel count), so it is reproducible bit-for-bit.
    */
  private def rasterStats(bi: BufferedImage): (Long, Double) = {
    var cks = 0L
    var sum = 0L
    var y = 0
    while (y < bi.getHeight) {
      var x = 0
      while (x < bi.getWidth) {
        val rgb = bi.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        cks = cks * 31 + lum
        sum += lum
        x += 1
      }
      y += 1
    }
    (cks, sum.toDouble / (bi.getWidth.toLong * bi.getHeight))
  }

  /** STUB — the non-image (and undecodable-image) fallback. Deterministic
    * on payload bytes.
    */
  private def fakeDecode(payload: Array[Byte]): (Long, Double) = {
    var checksum = 0L
    var sum = 0L
    payload.foreach { b => checksum = checksum * 31 + (b & 0xff); sum += (b & 0xff) }
    (checksum, if (payload.isEmpty) 0.0 else sum.toDouble / payload.length)
  }

  /** Frame-sampling policy: 1 "frame" per 500 ms for time media, 1 for
    * images — the sampling arithmetic is real even though frames are not.
    */
  private def frameCount(m: MediaRecord): Int =
    if (m.kind == "image") 1 else math.max(1, m.duration_ms / 500)

  /** Resize: fit within `maxDim` preserving aspect ratio. The dimension
    * arithmetic (the metadata half of a resize) is real; the pixel half is
    * the codec's and follows the same stub-behind-a-signature pattern as
    * the audio/video decode — a production resize swaps `fakeResize` for
    * the codec call, keeping the partition-batched shape. Records already
    * within bounds pass through untouched (payload identity, no re-encode).
    */
  def resizeStub(media: Dataset[MediaRecord],
      maxDim: Int = 256): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec/scaler init would go here
      it.map { m =>
        val big = math.max(m.width, m.height)
        if (big <= maxDim) m
        else {
          // floor semantics, min 1px — matches every mainstream scaler
          val w = math.max(1, m.width * maxDim / big)
          val h = math.max(1, m.height * maxDim / big)
          m.copy(width = w, height = h,
            payload = fakeResize(m.payload, w, h))
        }
      }
    }
  }

  /** STUB — replace with the real scaler. Deterministic: the "re-encoded"
    * payload length scales with the target pixel count so downstream
    * byte-level features keep behaving like a real re-encode.
    */
  private def fakeResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    // never exceeds the source length: a downscale re-encode cannot grow the
    // payload, and MediaSpec asserts that no-growth invariant
    val n = math.min(payload.length, math.max(16, (w * h) / 64))
    java.util.Arrays.copyOf(payload, n)
  }

  /** Per-kind feature aggregation — only scalar features shuffle, never the
    * payload. total_px sums the DECODED dimensions, so a silent decode
    * fallback (decoded_w = 0) is visible in the oracle-checked output.
    */
  def featureStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF().groupBy("kind").agg(
      count(lit(1)).as("n"),
      sum(col("n_bytes")).cast("long").as("total_bytes"),
      round(avg(col("mean_byte")), 4).as("avg_mean_byte"),
      sum(col("frames_sampled")).cast("long").as("total_frames"),
      sum((col("decoded_w") * col("decoded_h")).cast("long")).as("total_px"))
      .orderBy("kind")
}
