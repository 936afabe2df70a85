package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{AudioDedup, ImageDedup, Perceptual, VideoDedup}

/** The cross-modal leg of the streaming curation firehose — the
  * streaming form of the batch incremental contract (q_image_dups_incr /
  * q_audio_dups_incr / q_video_dups_incr): every arriving media payload
  * is fingerprinted scan-side (one codegen'd native call — the payload
  * never leaves the scan), matched against the STANDING perceptual
  * index by the SAME two-frame operator the batch tier runs
  * ([[graft.ops.Perceptual.bandedDupsAgainst]] for the 64-bit
  * image/audio fingerprints, [[graft.ops.VideoDedup.videoDupsAgainst]]
  * frame-set containment for clips — so streaming and batch verdicts
  * cannot drift), and routed with a verdict; each micro-batch's
  * NON-duplicate fingerprints then fold into the standing index, so
  * batch N+1 sees batch N's canonical assets — exactly how a
  * production media ingest maintains its perceptual index.
  *
  * Construct via the companion: [[StreamMediaDedup.image]] /
  * [[StreamMediaDedup.audio]] (banded hamming; verdict `score` = the
  * best match's hamming distance) / [[StreamMediaDedup.video]]
  * (frame-set containment; `score` = the best match's overlap
  * fraction). The class itself is modality-agnostic over two
  * functions: the fingerprint projection and the best-match pairing.
  *
  * Verdict semantics per arriving asset:
  *  - `is_dup` — some indexed asset cleared the modality's threshold;
  *    `matched_id`/`score` identify the BEST standing match
  *    (deterministic tiebreak on lowest indexed id);
  *  - undecodable payloads surface with `decoded = false` (the
  *    declared-fallback contract made visible in the stream) and are
  *    never admitted to the index;
  *  - duplicates are detected and reported, NOT silently dropped —
  *    retro-removal is the standing batch dedup's job, the same
  *    detect-don't-drop stance as [[StreamNearDup]].
  *
  * State shape: the index lives as a chain of materialized per-batch
  * fingerprint frames unioned lazily — each batch appends one
  * eagerly-checkpointed leaf, so lineage stays one level deep and
  * per-batch work is one index scan + increment-sized joins (the scan
  * is the batch contract too; a 100 TB deployment reads the index from
  * its columnar store instead of executor memory, same plan). Folding
  * only NON-dup fingerprints keeps the index the canonical-asset set:
  * re-uploads point at their match instead of piling into the bank.
  *
  * Delivery: the verdict sink sees every batch at-least-once; verdicts
  * are a pure function of (standing index, batch), so a replayed batch
  * re-emits identical rows and a keyed sink dedups them (T1). The
  * index FOLD is guarded by batch id (a replayed id folds nothing):
  * without the guard a replay would append the same fingerprints
  * twice, which the banded tiers absorb (candidates are distinct-ed)
  * but the containment tier does NOT — duplicated index rows double
  * the per-pair shared counts and can push overlap past 1. On restart
  * the in-memory chain rebuilds from the durable standing index, so
  * the guard only needs within-process monotonicity.
  *
  * @param hashRows  the modality's scan-side fingerprint projection
  *                  ((media_id, payload) → index-row shape)
  * @param bestMatch (standing index, batch fingerprints) →
  *                  (media_id, matched_id, score) — the modality's
  *                  two-frame incremental operator reduced to the best
  *                  standing match per arriving asset
  */
final class StreamMediaDedup(
    verdictSink: BatchSink,
    standingIndex: DataFrame,
    hashRows: DataFrame => DataFrame,
    bestMatch: (DataFrame, DataFrame) => DataFrame) {

  // per-batch fingerprint leaves; head = the initial standing index.
  // foreachBatch invocations are serialized per query, so plain state
  // with a volatile publish is enough.
  @volatile private var indexParts: Vector[DataFrame] =
    Vector(standingIndex.persist(StorageLevel.MEMORY_AND_DISK))
  @volatile private var lastFoldedId: Long = Long.MinValue

  /** Total index rows currently standing (diagnostic). */
  def indexSize: Long = indexParts.map(_.count()).sum

  private def currentIndex: DataFrame = indexParts.reduce(_ unionByName _)

  /** Start the leg over a streaming (media_id, payload, ts) frame.
    * Arriving ids must be disjoint from the standing index's and from
    * earlier batches' (any real ingest keys assets uniquely).
    */
  def start(media: DataFrame, checkpointDir: String): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        processBatch(batch.toDF(), id)
      }
      .start()

  /** One micro-batch: decode+hash once, pair against the standing
    * index, emit verdicts, fold the batch's canonical fingerprints in.
    * Exposed for the parity spec (same body the streaming query runs).
    */
  private[graft] def processBatch(b: DataFrame, id: Long): Unit = {
    val batch = b.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (batch.count() > 0) {
        val hashes = hashRows(
            batch.select(col("media_id"), col("payload")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        // persisted: best feeds both the verdict join and the index-fold
        // anti-join — without it each consumer would re-run the pairing
        // and scan the standing index a second time
        val best = bestMatch(currentIndex, hashes)
          .persist(StorageLevel.MEMORY_AND_DISK)
        // decoded = the projection produced at least one index row for
        // the asset (a distinct, NOT a join on the row-per-fingerprint
        // frame — a clip's many frame rows must not explode verdicts)
        val present = hashes.select(col("media_id")).distinct()
          .withColumn("_dec", lit(true))
        val verdicts = batch.select(col("media_id"), col("ts"))
          .join(present, Seq("media_id"), "left")
          .join(best, Seq("media_id"), "left")
          .select(col("media_id").cast("string").as("media_key"),
            col("media_id"), col("ts"),
            coalesce(col("_dec"), lit(false)).as("decoded"),
            col("matched_id").isNotNull.as("is_dup"),
            col("matched_id"), col("score"))
        verdictSink.write(verdicts, id)
        // fold the batch's canonical (non-dup, decodable) fingerprints
        // into the standing index as ONE materialized leaf. Eager
        // localCheckpoint, not persist: each keep's logical plan embeds
        // the CURRENT index (it anti-joins the batch's matches), so a
        // mere persist leaves a plan tree that doubles per batch —
        // measured as 2 GB plan strings within five micro-batches; the
        // checkpoint truncates the leaf to its materialized blocks
        // (increment-sized, the per-batch fold cost the contract
        // promises)
        if (id > lastFoldedId) {
          val keep = hashes
            .join(best.select(col("media_id")), Seq("media_id"), "left_anti")
            .localCheckpoint(true)
          indexParts = indexParts :+ keep
          lastFoldedId = id
        }
        best.unpersist()
        hashes.unpersist()
      }
    } finally { batch.unpersist(); () }
  }

  /** Release every index leaf (end-of-stream cleanup). */
  def close(): Unit = {
    indexParts.foreach(df => try df.unpersist(false) catch {
      case _: Throwable => ()
    })
    indexParts = Vector.empty
  }
}

object StreamMediaDedup {

  /** Best banded-hamming match per arriving asset: min (hamming, id). */
  private def bandedBest(bands: Int, bandBits: Int, maxHamming: Int)(
      index: DataFrame, fresh: DataFrame): DataFrame =
    Perceptual.bandedDupsAgainst(index, fresh, "media_id", bands,
        bandBits, maxHamming, "indexed_id", "new_id")
      .groupBy(col("new_id").as("media_id"))
      .agg(min(struct(col("hamming"), col("indexed_id"))).as("m"))
      .select(col("media_id"), col("m.indexed_id").as("matched_id"),
        col("m.hamming").cast("double").as("score"))

  /** Image leg: dHash fingerprints, banded hamming. */
  def image(verdictSink: BatchSink, standingIndex: DataFrame,
      maxHamming: Int = ImageDedup.ImgHamMax): StreamMediaDedup =
    new StreamMediaDedup(verdictSink, standingIndex, ImageDedup.hashRows,
      bandedBest(ImageDedup.ImgBands, ImageDedup.ImgBandBits, maxHamming))

  /** Audio leg: energy-delta fingerprints, banded hamming. */
  def audio(verdictSink: BatchSink, standingIndex: DataFrame,
      maxHamming: Int = AudioDedup.AudHamMax): StreamMediaDedup =
    new StreamMediaDedup(verdictSink, standingIndex, AudioDedup.hashRows,
      bandedBest(AudioDedup.AudBands, AudioDedup.AudBandBits, maxHamming))

  /** Video leg: per-frame hash sets, containment pairing — best match =
    * max overlap, then lowest indexed id.
    */
  def video(verdictSink: BatchSink, standingIndex: DataFrame,
      overlapMin: Double = VideoDedup.OverlapMin): StreamMediaDedup =
    new StreamMediaDedup(verdictSink, standingIndex, VideoDedup.hashRows,
      (index, fresh) =>
        VideoDedup.videoDupsAgainst(index, fresh, overlapMin)
          .groupBy(col("new_id").as("media_id"))
          .agg(min(struct((-col("overlap")).as("_neg"),
            col("indexed_id"))).as("m"))
          .select(col("media_id"), col("m.indexed_id").as("matched_id"),
            (-col("m._neg")).as("score")))
}
