package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VideoFrameHashes

/** Cross-modal (video) near-duplicate detection — the last modality of
  * the perceptual tier: per-frame 64-bit dHashes (native
  * [[graft.functions.VideoFrameHashes]] over the REAL raw-DIB/MJPEG AVI
  * decode, hashing each frame with bit-for-bit the image tier's
  * [[graft.functions.ImageDHashUtil.hashLuma]]), then clip-level
  * pairing by FRAME-SET CONTAINMENT: two clips pair when the fraction
  * of shared distinct frame hashes over the smaller clip's set reaches
  * [[OverlapMin]]. Containment (not Jaccard) is deliberate — the
  * dominant video near-dup relations are temporal: a TRIMMED excerpt
  * shares all of ITS frames but few of the original's, exactly the
  * asymmetry [[TextDedup.containmentPairsOf]] documents for text
  * excerpts; and frame-rate changes / re-encodes / brightness shifts
  * leave the frame-hash SET invariant even though no clip-level byte
  * matches.
  *
  * Scale notes (100 TB of video):
  *  - payloads never shuffle: the decode + per-frame hashing runs
  *    scan-side (one codegen'd call), and only (media_id, frame_hash)
  *    rows — 16 bytes each, a few dozen per clip — enter the exchange;
  *  - candidate generation is an inverted index on frame hash (one
  *    groupBy shuffle, the minhash-band shape), NEVER all-pairs; hot
  *    hashes (test cards, black frames, station idents shared by
  *    thousands of clips) are capped at [[TextDedup.MaxBucket]] ids,
  *    the same stop-sign as every LSH tier;
  *  - the per-bucket suffix pairing is NOT distinct-ed here (unlike
  *    [[TextDedup.suffixPairs]]): each bucket is one distinct shared
  *    hash, so counting pair occurrences IS |A∩B| — the intersection
  *    arrives from the aggregation for free, no array materialization
  *    and no second pass over the sets.
  */
object VideoDedup {

  /** Synthetic corpus shape: [[Groups]] groups x 4 variants. */
  val Groups = 40
  val BaseW = 36 // divisible by the 9-wide grid (see ImageDedup)
  val BaseH = 32 // divisible by the 8-tall grid
  val LumaMod = 200
  val Shift = 16
  /** Frames per base clip; variant 2 drops the first [[TrimStart]]. */
  val NFrames = 10
  val TrimStart = 2
  /** Min shared-over-smaller-set fraction to pair. */
  val OverlapMin = 0.8

  /** The deterministic pattern luma of clip (g, v)'s frame t at DISPLAY
    * raster coordinates — pure integer arithmetic, replicated verbatim
    * by the DuckDB oracle (the t-mixed multipliers keep every frame of
    * every clip distinct; frame hashes verified pairwise-distinct
    * within each clip by VideoDedupSpec).
    *
    * Variants: v0 = frames 0..9 of the base pattern; v1 = the SAME
    * frames each shown TWICE at +Shift brightness (frame-rate doubling
    * + brightness shift — frame-hash-set identical); v2 = frames 2..9
    * (a trimmed excerpt — containment 1.0 over its own set); v3 = an
    * unrelated pattern.
    */
  private[graft] def luma(g: Long, v: Int, t: Int, bx: Int, by: Int): Int =
    if (v == 3)
      ((g * 37 + 11 + t.toLong * 53 + bx.toLong * (101 + 9 * ((g + 2 * t) % 17)) +
        by.toLong * (47 + 5 * ((g + t) % 19)) +
        bx.toLong * by * (13 + 3 * ((g + 3 * t) % 23))) % LumaMod).toInt
    else
      ((g * 37 + t.toLong * 61 + bx.toLong * (73 + 7 * ((g + 3 * t) % 13)) +
        by.toLong * (151 + 5 * ((g + 2 * t) % 11)) +
        bx.toLong * by * (29 + 3 * ((g + t) % 7))) % LumaMod).toInt

  /** Render one variant as a raw-DIB AVI through the shared
    * [[Media.encodeAviLuma]] container writer.
    */
  private[graft] def encode(g: Long, v: Int): Array[Byte] = {
    val frames: Array[(Int, Int) => Int] = v match {
      case 1 => Array.tabulate(2 * NFrames)(t =>
        (x, y) => luma(g, 1, t / 2, x, y) + Shift)
      case 2 => Array.tabulate(NFrames - TrimStart)(t =>
        (x, y) => luma(g, 2, t + TrimStart, x, y))
      case _ => Array.tabulate(NFrames)(t => (x, y) => luma(g, v, t, x, y))
    }
    Media.encodeAviLuma(BaseW, BaseH, frames)
  }

  /** Deterministic synthetic video-dedup corpus: real AVI payloads whose
    * decoded frame rasters are pure arithmetic in (group, variant,
    * frame, x, y).
    */
  def videoTable(spark: SparkSession, nGroups: Int = Groups): DataFrame = {
    import spark.implicits._
    spark.range(nGroups * 4L)
      .map { id => (id, encode(id / 4, (id % 4).toInt)) }
      .toDF("media_id", "payload")
  }

  /** Temporal near-dup pairs: (vid_a, vid_b, overlap) with vid_a <
    * vid_b and overlap = |shared distinct frame hashes| / min(|A|, |B|)
    * >= overlapMin. The division is two exact BIGINTs — bit-identical
    * in the oracle, no rounding needed.
    */
  def videoDups(videos: DataFrame,
      overlapMin: Double = OverlapMin): DataFrame = {
    // skinny (id, distinct frame hashes) frame: decode + per-frame
    // hashing run ONCE scan-side; distinct because containment is set
    // semantics (a doubled frame rate must not double the intersection).
    // Persisting BEFORE the explode lets the per-clip set size derive
    // from the same frame with zero additional shuffles — sizes is a
    // projection, not an aggregation.
    val sets = Par.fanOut(videos, "media_id")
      .select(col("media_id"),
        array_distinct(VideoFrameHashes(col("payload"))).as("hs"))
      .filter(col("hs").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hashes = sets.select(col("media_id"), explode(col("hs")).as("h"))
    val fanout = videos.sparkSession.sessionState.conf.numShufflePartitions
    val sizes = sets.select(col("media_id"), size(col("hs")).as("n"))
    val buckets = hashes
      // pin the inverted-index exchange width (AQE would coalesce the
      // tiny-BYTES hash rows — same rationale as every banded tier)
      .repartition(fanout, col("h"))
      .groupBy(col("h"))
      .agg(sort_array(collect_list(col("media_id"))).as("ids"))
    // per-bucket ordered suffix pairs WITHOUT the distinct: one row per
    // (pair, shared hash), so the count aggregation below IS |A∩B|
    val ids = col("ids")
    val pairExpr = flatten(transform(ids, (a, i) =>
      transform(slice(ids, i + lit(2), size(ids)),
        b => struct(a.as("vid_a"), b.as("vid_b")))))
    val shared = buckets
      .filter(size(ids) <= TextDedup.MaxBucket)
      .select(explode(pairExpr).as("p"))
      .groupBy(col("p.vid_a").as("vid_a"), col("p.vid_b").as("vid_b"))
      .agg(count(lit(1)).as("shared"))
    // two key joins to the per-clip set sizes (broadcast at audit scale;
    // key-partitioned at corpus scale — sizes is one skinny row per clip,
    // NOT driver-collected)
    shared
      .join(sizes.as("na"), col("vid_a") === col("na.media_id"))
      .join(sizes.as("nb"), col("vid_b") === col("nb.media_id"))
      .withColumn("overlap",
        col("shared") / least(col("na.n"), col("nb.n")))
      .filter(col("overlap") >= overlapMin)
      .select(col("vid_a"), col("vid_b"), col("overlap"))
      .orderBy("vid_a", "vid_b")
  }
}
