package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * The decode step is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic fake features from the
  * payload bytes. Everything around it — schema, partition-parallel batch
  * iteration, feature struct shape, downstream aggregation — is the real
  * Spark plumbing a production decode (JNI/FFmpeg/pillow-equivalent) would
  * drop into: swap `fakeDecode` for the real codec, keep the signature.
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
      checksum: Long, // stand-in for a decoded-content digest
      mean_byte: Double, // stand-in for e.g. mean luminance
      frames_sampled: Int)

  /** Deterministic synthetic media table (payload = repeated md5 bytes of
    * the id — stable across runs and engines).
    */
  def mediaTable(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val seed = java.security.MessageDigest.getInstance("MD5")
        .digest(s"media:$i".getBytes("UTF-8"))
      val payload = Array.fill((i % 7).toInt + 1)(seed).flatten
      MediaRecord(i, kind, payload, 64 + (i % 64).toInt * 8,
        64 + (i % 48).toInt * 8, if (kind == "image") 0 else 1000 + (i % 60).toInt * 500)
    }
  }

  /** The stubbed decode: in production this calls the codec; here it derives
    * deterministic features from the bytes. Partition-batched like a real
    * vectorized decode (one "codec context" per partition, amortized).
    */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "codec" init would go here (expensive, amortized)
      it.map { m =>
        val fake = fakeDecode(m.payload)
        MediaFeatures(m.media_id, m.kind, m.payload.length, fake._1, fake._2,
          frameCount(m))
      }
    }
  }

  /** STUB — replace with the real decoder. Deterministic on payload bytes. */
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
    * [[decodeStub]] — a production resize swaps `fakeResize` for the codec
    * call, keeping the partition-batched shape. Records already within
    * bounds pass through untouched (payload identity, no re-encode).
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
    * payload.
    */
  def featureStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF().groupBy("kind").agg(
      count(lit(1)).as("n"),
      sum(col("n_bytes")).cast("long").as("total_bytes"),
      round(avg(col("mean_byte")), 4).as("avg_mean_byte"),
      sum(col("frames_sampled")).cast("long").as("total_frames"))
      .orderBy("kind")
}
