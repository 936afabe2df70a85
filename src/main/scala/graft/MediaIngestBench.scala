package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.ops.{AudioDedup, ImageDedup, VideoDedup}
import graft.streaming.{ParquetSink, StreamMediaDedup}

/** Streaming media-ingest benchmark: drives the cross-modal image leg
  * ([[graft.streaming.StreamMediaDedup]]: file replay → scan-side
  * ImageDHash → incremental banded join against the standing perceptual
  * index → verdict sink → index fold) at firehose volume and reports
  * sustained images/second, per-batch seconds (the flatness evidence —
  * per-batch cost must be decode-dominated, not index-growth-dominated),
  * dup counts, and the final index size.
  *
  * Same harness discipline as [[CurationBench]]: batch files staged up
  * front (parquet, binary payloads), atomically moved into the watched
  * dir, tmpfs scratch when available. Workload: ~10% of arriving images
  * are re-ingests of a standing asset (BMP re-encode at +IncShift
  * brightness — fingerprint-identical, the "same asset re-uploaded"
  * case), the rest genuinely new patterned rasters (every one distinct);
  * the standing index starts from [[ImageDedup.imageTable]]'s corpus.
  *
  * Usage: runMain graft.MediaIngestBench [nAssets] [nBatches]
  * [mode=image|audio|video]. Video mode streams raw-DIB AVI clips
  * through the frame-set containment pairing (re-ingests are
  * trimmed+brightened excerpts of standing clips — the
  * q_video_dups_incr relation at firehose volume); audio mode streams
  * real WAV clips through the banded acoustic-fingerprint pairing
  * (re-ingests are gain-scaled copies — fingerprint-identical). Emits
  * one JSON line (plus media_bench_out.json).
  */
object MediaIngestBench {

  /** Standing corpus groups (index starts at 4x this many fingerprints). */
  val StandingGroups = 600

  /** Payload for arriving image i: every 10th a re-ingest of standing
    * group (i/10) % StandingGroups (+IncShift BMP re-encode —
    * fingerprint-identical to the standing asset), the rest new
    * patterned rasters whose multiplier structure comes from a splitmix
    * bit mix of i. The mix matters: the oracle corpora's small affine
    * multiplier families alias across ids (they repeat mod 19·17·13),
    * which at firehose volume makes unrelated images near-share dHashes
    * — measured 2.4x the planted dup count at just 5k images. ~23 bits
    * of structural entropy keep spurious near-dups to background level
    * (they still occur, as in any real corpus, and are reported
    * separately from planted recall).
    */
  private[graft] def encodeFor(i: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(ImageDedup.BaseW,
      ImageDedup.BaseH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val reIngest = i % 10 == 0
    var z = i * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = z ^ (z >>> 27)
    val m1 = 73 + (z & 63); val m2 = 151 + ((z >> 6) & 63)
    val m3 = 29 + ((z >> 12) & 63); val m4 = 13 + ((z >> 18) & 31)
    val off = (z >> 23) & 0xff
    var y = 0
    while (y < ImageDedup.BaseH) {
      var x = 0
      while (x < ImageDedup.BaseW) {
        val l =
          if (reIngest)
            ImageDedup.luma((i / 10) % StandingGroups, 0, x, y) +
              ImageDedup.IncShift
          else
            ((off + x * m1 + y * m2 + x.toLong * y * m3 +
              ((x + y) % 7) * m4) % ImageDedup.LumaMod).toInt
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, if (reIngest) "bmp" else "png", bos)
    bos.toByteArray
  }

  /** Video-mode payload for arriving clip i: every 10th a re-ingest of
    * standing group (i/10) % StandingGroups as a trimmed+brightened
    * raw-DIB excerpt (frame-hash set equal to the trimmed variant's →
    * containment 1.0 against v0/v1/v2), the rest genuinely new 10-frame
    * clips whose per-frame structure comes from a splitmix of (i, t) —
    * same entropy rationale as the image generator.
    */
  private[graft] def encodeVideoFor(i: Long): Array[Byte] = {
    val reIngest = i % 10 == 0
    val frames: Array[(Int, Int) => Int] =
      if (reIngest) {
        val g = (i / 10) % StandingGroups
        Array.tabulate(VideoDedup.NFrames - VideoDedup.TrimStart)(t =>
          (x, y) => VideoDedup.luma(g, 0, t + VideoDedup.TrimStart, x, y) +
            VideoDedup.IncShift)
      } else
        Array.tabulate(VideoDedup.NFrames) { t =>
          var z = (i * 31 + t) * 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = z ^ (z >>> 27)
          val m1 = 73 + (z & 63); val m2 = 151 + ((z >> 6) & 63)
          val m3 = 29 + ((z >> 12) & 63); val m4 = 13 + ((z >> 18) & 31)
          val off = (z >> 23) & 0xff
          (x, y) =>
            ((off + x * m1 + y * m2 + x.toLong * y * m3 +
              ((x + y) % 7) * m4) % VideoDedup.LumaMod).toInt
        }
    graft.ops.Media.encodeAviLuma(VideoDedup.BaseW, VideoDedup.BaseH,
      frames)
  }

  /** Audio-mode payload for arriving clip i: every 10th a re-ingest of
    * standing group (i/10) % StandingGroups at [[AudioDedup.IncGain]]x
    * gain (fingerprint-identical — "the same recording re-uploaded
    * louder"), the rest genuinely new clips whose per-frame amplitude
    * structure comes from a splitmix of (i, frame) — same entropy
    * rationale as the image generator.
    */
  private[graft] def encodeAudioFor(i: Long): Array[Byte] = {
    val reIngest = i % 10 == 0
    val nf = graft.functions.AudioFingerprintUtil.Frames
    val n = nf * AudioDedup.FrameK
    val data = new Array[Byte](n * 2)
    var k = 0
    while (k < n) {
      val f = k / AudioDedup.FrameK
      val a =
        if (reIngest)
          AudioDedup.amp((i / 10) % StandingGroups, 0, f) *
            AudioDedup.IncGain
        else {
          var z = (i * 131 + f) * 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = z ^ (z >>> 27)
          ((z >>> 33) % AudioDedup.AmpMod).toInt
        }
      val sgn = if (k % 2 == 0) a else -a
      data(2 * k) = (sgn & 0xff).toByte
      data(2 * k + 1) = ((sgn >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val mode = args.drop(2).headOption.getOrElse("image")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val shm = Paths.get("/dev/shm")
    val base = if (Files.isWritable(shm))
      Files.createTempDirectory(shm, "graft-mediabench")
    else Files.createTempDirectory("graft-mediabench")
    val stage = Files.createDirectory(base.resolve("stage"))
    val watch = Files.createDirectory(base.resolve("in"))

    // stage every batch up front: parquet part files of (media_id,
    // payload, ts) — payload encode runs distributed, once, pre-timer
    val batchSize = n / nBatches
    val newBase = ImageDedup.NewMediaBase
    val enc: Long => Array[Byte] = mode match {
      case "video" => encodeVideoFor
      case "audio" => encodeAudioFor
      case _ => encodeFor
    }
    def writeBatch(b: Int, lo: Long, hi: Long): Path = {
      val dir = stage.resolve(f"batch$b%05d")
      spark.range(lo, hi, 1, 8)
        .map { i => (newBase + i, enc(i),
          new java.sql.Timestamp(1704100000000L + i * 100L)) }
        .toDF("media_id", "payload", "ts")
        .write.parquet(dir.toString)
      dir
    }
    // warmup ids sit beyond the timed stream's range (excluded from
    // reported counts by the id filter below)
    val warmup = writeBatch(-1, n.toLong + 1000000L, n.toLong + 1001000L)
    val staged = (0 until nBatches).map { b =>
      writeBatch(b, b.toLong * batchSize, (b + 1).toLong * batchSize)
    }
    // move each part file in (every part is a complete parquet; the
    // file source needs no batch atomicity — a split batch is just two
    // micro-batches)
    def release(dir: Path): Unit = {
      val s = Files.list(dir)
      try s.iterator().forEachRemaining { p =>
        if (p.getFileName.toString.endsWith(".parquet"))
          Files.move(p, watch.resolve(
            dir.getFileName.toString + "-" + p.getFileName),
            StandardCopyOption.ATOMIC_MOVE)
      } finally s.close()
    }

    val verdictDir = base.resolve("verdicts").toString
    val sink = new ParquetSink(verdictDir, maxFiles = 8)
    val indexDir = base.resolve("index").toString
    val leg = mode match {
      case "video" =>
        StreamMediaDedup.video(sink, VideoDedup.hashRows(
          VideoDedup.videoTable(spark, StandingGroups)), indexDir)
      case "audio" =>
        StreamMediaDedup.audio(sink, AudioDedup.hashRows(
          AudioDedup.audioTable(spark, StandingGroups)), indexDir)
      case _ =>
        StreamMediaDedup.image(sink, ImageDedup.hashRows(
          ImageDedup.imageTable(spark, StandingGroups)), indexDir)
    }
    val q = leg.start(
      spark.readStream.schema("media_id LONG, payload BINARY, ts TIMESTAMP")
        .parquet(watch.toString),
      base.resolve("ck").toString)

    release(warmup)
    q.processAllAvailable()
    // sampled AFTER the warmup batch folds, so index_end - index_start
    // covers exactly the timed stream's growth
    val indexSize0 = leg.indexSize
    val t0 = System.nanoTime()
    val batchSec = staged.map { p =>
      val b0 = System.nanoTime()
      release(p)
      q.processAllAvailable()
      (System.nanoTime() - b0) / 1e9
    }
    val sec = (System.nanoTime() - t0) / 1e9
    q.stop()

    val verdicts = spark.read.parquet(verdictDir)
      // exclude the warmup batch (ids beyond the timed range)
      .filter(col("media_id") >= newBase &&
        col("media_id") < newBase + n)
      .persist()
    val nV = verdicts.count()
    val nDup = verdicts.filter(col("is_dup")).count()
    val nUndec = verdicts.filter(!col("decoded")).count()
    // planted re-ingests are the ids with (media_id - newBase) % 10 == 0;
    // every one must be flagged (fingerprint-identical to its standing
    // asset) — the recall line of the ledger claim
    val planted = verdicts.filter((col("media_id") - newBase) % 10 === 0)
    val nPlanted = planted.count()
    val nPlantedFound = planted.filter(col("is_dup")).count()
    val ips = n / sec
    val sorted = batchSec.sorted
    val medianBatch = sorted(sorted.size / 2)
    // the flatness line of the standing-index contract: per-batch cost
    // must not grow with the index, so compare the first half's median
    // batch time against the second half's
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    val firstHalf = median(batchSec.take(batchSec.size / 2))
    val secondHalf = median(batchSec.drop(batchSec.size / 2))
    val line = s"""{"metric":"media_ingest_throughput","value":$ips,""" +
      s""""unit":"images/sec","mode":"$mode","images":$n,""" +
      s""""batches":$nBatches,""" +
      s""""seconds":$sec,"median_batch_sec":$medianBatch,""" +
      f""""median_batch_first_half":$firstHalf%.2f,""" +
      f""""median_batch_second_half":$secondHalf%.2f,""" +
      s""""verdicts":$nV,"dups":$nDup,"undecodable":$nUndec,""" +
      s""""planted":$nPlanted,"planted_found":$nPlantedFound,""" +
      s""""index_start":$indexSize0,"index_end":${leg.indexSize},""" +
      s""""batch_seconds":${batchSec.map(t => f"$t%.2f").mkString("[", ",", "]")}}"""
    Files.writeString(Paths.get("media_bench_out.json"), line)
    println(line)
    leg.close()
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
  }
}
