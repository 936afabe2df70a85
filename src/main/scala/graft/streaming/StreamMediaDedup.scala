package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{ImageDedup, Perceptual}

/** The cross-modal (image) leg of the streaming curation firehose — the
  * streaming form of the batch q_image_dups_incr contract: every
  * arriving media payload is fingerprinted scan-side (native
  * [[graft.functions.ImageDHash]], one codegen'd call — the payload
  * never leaves the scan), checked against the STANDING perceptual
  * index via the shared incremental banded join
  * ([[graft.ops.Perceptual.bandedDupsAgainst]], the same code the batch
  * tier runs — so streaming and batch verdicts cannot drift), and
  * routed with a verdict column; each micro-batch's NON-duplicate
  * fingerprints then fold into the standing index, so batch N+1 sees
  * batch N's canonical assets — exactly how a production media ingest
  * maintains its perceptual index.
  *
  * Verdict semantics per arriving asset:
  *  - `is_dup` — some indexed fingerprint is within the hamming
  *    threshold; `matched_id`/`hamming` identify the BEST standing
  *    match (min hamming, then min indexed id — deterministic);
  *  - undecodable payloads surface with `decoded = false` (the
  *    declared-fallback contract made visible in the stream) and are
  *    never admitted to the index;
  *  - duplicates are detected and reported, NOT silently dropped —
  *    retro-removal is the standing batch dedup's job, the same
  *    detect-don't-drop stance as [[StreamNearDup]].
  *
  * State shape: the index lives as a chain of PERSISTED per-batch
  * fingerprint frames (16 bytes/row) unioned lazily — each batch
  * appends one materialized leaf, so lineage stays one level deep and
  * per-batch work is one index scan + increment-sized joins (the scan
  * is the batch contract too; a 100 TB deployment reads the index from
  * its columnar store instead of executor memory, same plan). Folding
  * only NON-dup fingerprints keeps the index the canonical-asset set:
  * re-uploads point at their match instead of piling into the bank.
  *
  * Delivery: the verdict sink sees every batch at-least-once; verdicts
  * are a pure function of (standing index, batch), so a replayed batch
  * re-emits identical rows and a keyed sink dedups them (T1). Index
  * folding is idempotent under replay for the same reason only when
  * ids are stable — the caller's id contract, as everywhere in the
  * media tier.
  */
/** @param hashRows the modality's scan-side fingerprint projection
  *   ((media_id, payload) → (media_id, h)) — [[graft.ops.ImageDedup.hashRows]]
  *   by default, [[graft.ops.AudioDedup.hashRows]] for the acoustic leg;
  *   band geometry follows the modality. The leg is modality-generic
  *   because the pairing IS: every fingerprint family shares
  *   [[graft.ops.Perceptual.bandedDupsAgainst]].
  */
final class StreamMediaDedup(
    verdictSink: BatchSink,
    standingIndex: DataFrame,
    hashRows: DataFrame => DataFrame = ImageDedup.hashRows,
    bands: Int = ImageDedup.ImgBands,
    bandBits: Int = ImageDedup.ImgBandBits,
    maxHamming: Int = ImageDedup.ImgHamMax) {

  // per-batch fingerprint leaves; head = the initial standing index.
  // foreachBatch invocations are serialized per query, so plain state
  // with a volatile publish is enough.
  @volatile private var indexParts: Vector[DataFrame] =
    Vector(standingIndex.persist(StorageLevel.MEMORY_AND_DISK))

  /** Total fingerprints currently in the standing index (diagnostic). */
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
  private[streaming] def processBatch(b: DataFrame, id: Long): Unit = {
    val batch = b.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (batch.count() > 0) {
        val hashes = hashRows(
            batch.select(col("media_id"), col("payload")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val index = currentIndex
        val pairs = Perceptual.bandedDupsAgainst(index, hashes,
          "media_id", bands, bandBits, maxHamming, "indexed_id", "new_id")
        // best standing match per arriving asset: min (hamming,
        // indexed_id) — a skinny increment-sized argmin
        // persisted: best feeds both the verdict join and the index-fold
        // anti-join — without it each consumer would re-run the banded
        // join and scan the standing index a second time
        val best = pairs
          .groupBy(col("new_id").as("media_id"))
          .agg(min(struct(col("hamming"), col("indexed_id"))).as("m"))
          .select(col("media_id"), col("m.indexed_id").as("matched_id"),
            col("m.hamming").as("hamming"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val verdicts = batch.select(col("media_id"), col("ts"))
          .join(hashes.select(col("media_id"), col("h")), Seq("media_id"),
            "left")
          .join(best, Seq("media_id"), "left")
          .select(col("media_id").cast("string").as("media_key"),
            col("media_id"), col("ts"), col("h"),
            col("h").isNotNull.as("decoded"),
            col("matched_id").isNotNull.as("is_dup"),
            col("matched_id"), col("hamming"))
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
        val keep = hashes
          .join(best.select(col("media_id")), Seq("media_id"), "left_anti")
          .localCheckpoint(true)
        indexParts = indexParts :+ keep
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
