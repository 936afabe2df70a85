package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.TextDedup

/** The standing-index TEXT leg of the streaming curation firehose —
  * the streaming form of the batch incremental contract
  * (q_dedup_incremental), completing the streaming standing-index
  * symmetry across every family: [[StreamNearDup]] catches duplicate
  * pairs WITHIN the watermark window (bounded fmgws state, both
  * members in-stream); this leg catches arriving documents that
  * near-duplicate the CURATED HISTORY — the standing corpus the batch
  * tier indexed — which no windowed operator can see.
  *
  * Topology per micro-batch: MinHash signatures + shingle hashes
  * computed scan-side (the same native [[graft.functions.MinHashSig]] /
  * [[graft.functions.ShingleHashes]] the batch path uses, so
  * signatures are value-identical by construction) → band keys consult
  * the durable standing band index by the SAME pairing core the batch
  * tier runs ([[graft.ops.TextDedup.incrementalDupsFromBands]]: shared
  * bands → index-side hot-band cap → exact shingle-set jaccard on
  * candidates only — verdicts cannot drift from q_dedup_incremental) →
  * best standing match per arriving doc → verdict sink; each batch's
  * NON-duplicate signatures then fold into the standing index, so
  * batch N+1 sees batch N's canonical documents.
  *
  * Verdict semantics per arriving document:
  *  - `is_dup` — some standing document's shingle set cleared
  *    `minJaccard`; `matched_id`/`jaccard` identify the BEST standing
  *    match (max jaccard, then lowest indexed id);
  *  - documents too short to signature (< ShingleK words) surface with
  *    `has_sig = false` — the batch tier's drop contract made visible
  *    in the stream — and are never admitted to the index;
  *  - duplicates are detected and reported, NOT silently dropped —
  *    the same detect-don't-drop stance as the other legs.
  *
  * State shape: the standing index lives in a durable [[FoldStore]] —
  * band-exploded signature rows (doc_id, band, shingles),
  * hash-prefix-partitioned by band key, so each micro-batch's consult
  * prunes to the band buckets it touches at file granularity; restart
  * recovery, the durable replay-guarded fold, and segment compaction
  * are the store's (shared with [[StreamMediaDedup]] /
  * [[StreamEmbedDedup]]).
  *
  * Within-batch pairs are NOT this leg's verdict surface
  * ([[StreamNearDup]] owns in-window pairing) — but the FOLD dedups
  * within the batch (r12): without it two near-copies arriving in one
  * micro-batch would BOTH fold as canonical forever, accreting
  * duplicates into the standing index at a rate set by the batch's
  * internal dup rate. The fold keeps the min-id member of each
  * within-batch near-dup pair — the same non-iterative min-id-wins
  * simplification as [[graft.ops.EmbedSim.semVerdictsAgainst]]'s
  * vsBatch leg (a doc dropped from the fold still counts as a
  * smaller-id blocker for later ids).
  *
  * Delivery: verdicts are a pure function of (standing index MINUS the
  * batch's own ids, batch) — the self-exclusion is the r12 replay
  * shield: a batch replayed after its fold committed would otherwise
  * find its own kept signatures standing, self-match at jaccard 1, and
  * flip every kept doc to dup-of-itself; with the shield the replay
  * sees exactly the pre-fold index and re-emits identical rows (T1,
  * spec-pinned on verdict content). The fold is double-guarded: the
  * durable `lastFoldedId` stops a same-id replay, and an anti-join
  * against doc ids already standing in the touched buckets stops a
  * re-delivery under a NEW batch id from planting twin signature rows.
  */
final class StreamTextDedup private (
    verdictSink: BatchSink,
    private[graft] val store: FoldStore,
    minJaccard: Double) {

  /** Distinct documents currently standing in the index (diagnostic). */
  def indexSize: Long = store.assets("doc_id")

  /** Start the leg over a streaming (doc_id, text, ts) frame. Arriving
    * ids must be disjoint from the standing index's and from earlier
    * batches' (any real ingest keys documents uniquely).
    */
  def start(docs: DataFrame, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        processBatch(batch.toDF(), id)
      }
      .start()

  /** One micro-batch: signature once, pair against the pruned standing
    * band index, emit verdicts, fold the batch's canonical signatures
    * in. Exposed for the parity spec (same body the streaming query
    * runs).
    */
  private[graft] def processBatch(b: DataFrame, id: Long): Unit = {
    val batch = b.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (batch.count() > 0) {
        val fresh = StreamTextDedup.sigRows(
            batch.select(col("doc_id"), col("text")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val pks = fresh.select(StreamTextDedup.pkOf).distinct()
          .collect().map(_.getInt(0)).toSeq
        // batch-lifetime cache of the pruned band-index read (the
        // pairing core consumes the index side twice — cap + candidate
        // join; see StreamMediaDedup for the measured rationale)
        val pruned = store.readFor(pks)
          .select(col("doc_id"), col("band"), col("shingles"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val batchIds = fresh.select(col("doc_id")).distinct()
        // replay shield: a batch replayed after its fold committed must
        // see the PRE-fold index — its own ids (present only on such a
        // replay) are excluded before pairing; the id set is batch-sized
        val index = pruned.join(broadcast(batchIds),
          Seq("doc_id"), "left_anti")
        val best = TextDedup.incrementalDupsFromBands(index, fresh,
            minJaccard)
          .groupBy(col("new_id").as("doc_id"))
          .agg(min(struct((-col("jaccard")).as("_nj"),
            col("indexed_id"))).as("m"))
          .select(col("doc_id"), col("m.indexed_id").as("matched_id"),
            (-col("m._nj")).as("jaccard"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val present = fresh.select(col("doc_id")).distinct()
          .withColumn("_sig", lit(true))
        val verdicts = batch.select(col("doc_id"), col("ts"))
          .join(present, Seq("doc_id"), "left")
          .join(best, Seq("doc_id"), "left")
          .select(col("doc_id").cast("string").as("doc_key"),
            col("doc_id"), col("ts"),
            coalesce(col("_sig"), lit(false)).as("has_sig"),
            col("matched_id").isNotNull.as("is_dup"),
            col("matched_id"), col("jaccard"))
        verdictSink.write(verdicts, id)
        // fold the batch's canonical (non-dup, signatured) band rows
        // into the standing index as ONE durable increment-sized
        // segment — minus within-batch near-dups (min-id member wins:
        // the same pairing core run fresh-vs-fresh, so two near-copies
        // arriving together cannot BOTH become canonical) and minus ids
        // already standing in the touched buckets (the new-batch-id
        // re-delivery guard; empty in normal disjoint-id operation)
        if (id > store.lastFoldedId) {
          // lazy — the broadcast below is its single evaluation
          val withinDup = StreamTextDedup.withinBatchDups(fresh, minJaccard)
          val alreadyStanding = pruned.select(col("doc_id"))
            .join(broadcast(batchIds), Seq("doc_id"), "left_semi")
            .distinct()
          val keep = fresh
            .join(best.select(col("doc_id")), Seq("doc_id"), "left_anti")
            .join(broadcast(withinDup), Seq("doc_id"), "left_anti")
            .join(broadcast(alreadyStanding), Seq("doc_id"), "left_anti")
          store.append(keep.withColumn("pk", StreamTextDedup.pkOf), id)
        }
        best.unpersist()
        pruned.unpersist()
        fresh.unpersist()
      }
    } finally { batch.unpersist(); () }
  }

  /** Release the durable store's writer lock (the index itself stays
    * on disk).
    */
  def close(): Unit = store.close()
}

object StreamTextDedup {

  /** Hash-prefix bucket count of the durable band-index layout. */
  val PrefixParts = 64

  private[streaming] def pkOf = FoldStore.pk(PrefixParts, col("band"))

  /** The fold's within-batch dedup set: doc ids that must NOT fold
    * because a smaller-id member of the SAME batch carries the same or
    * near-same content (exact hash equality, or shared-band candidates
    * verified at `minJaccard` shingle jaccard) — the non-iterative
    * min-id-wins greedy of [[graft.ops.EmbedSim.semVerdictsAgainst]]'s
    * vsBatch leg.
    *
    * Cost shape (measured on a 10k-doc batch carrying a 1k-copy
    * boilerplate clique): shingle arrays NEVER cross a shuffle. The
    * exact collapse hashes each doc's shingles map-side and shuffles
    * only (doc_id, hash); the band pairing self-joins (doc_id, band)
    * pairs only (the clique is already one representative, so band
    * buckets are near-unique); and the jaccard verify joins the tiny
    * candidate-pair set against a broadcast of just the candidates'
    * arrays. The first cut ran the index consult's
    * dedup-pairs-then-verify core fresh-vs-fresh — right for a
    * corpus-sized side, but its two array-carrying groupBy shuffles
    * priced at 4.5-6.5 s per batch here vs ~1 s for this shape.
    */
  private[graft] def withinBatchDups(fresh: DataFrame,
      minJaccard: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE lazy plan, evaluated once by the caller's broadcast — the
    // first cut assembled this from pinned intermediates feeding six
    // broadcast joins, and the per-job fixed cost of those ~13 tiny
    // actions priced at 4.5-6.5 s per 10k-doc batch; this shape runs
    // zero driver actions of its own and shuffles shingle arrays
    // exactly twice (the rep join and the band grouping).
    //
    // Exact collapse by content hash via a window (no joins): the
    // identical-content clique (boilerplate — the realistic firehose
    // dup mass) reduces to its min-id representative before any band
    // work, so band buckets among representatives are near-unique.
    val docHash = fresh
      .select(col("doc_id"), xxhash64(col("shingles")).as("_ch"))
      .groupBy(col("doc_id")).agg(first(col("_ch")).as("_ch"))
      .withColumn("_m",
        min(col("doc_id")).over(Window.partitionBy(col("_ch"))))
    val exactDup = docHash.filter(col("doc_id") > col("_m"))
      .select(col("doc_id"))
    val repIds = docHash.filter(col("doc_id") === col("_m"))
      .select(col("doc_id"))
    // near-dup pairing among representatives: per-band sorted
    // (doc_id, shingles) lists, ordered pairs exploded and
    // jaccard-verified INSIDE the band's task — a batch-bounded bucket
    // never needs the index consult's dedup-pairs-then-verify shape,
    // and the hot-band cap (post-collapse, so only a pathological
    // near-but-NOT-exact clique trips it) bounds the per-task pair
    // count at MaxBucket²
    val nearDup = fresh.join(repIds, Seq("doc_id"))
      .groupBy(col("band"))
      .agg(sort_array(collect_list(struct(col("doc_id"),
        col("shingles")))).as("xs"))
      .filter(size(col("xs")).between(2, TextDedup.MaxBucket))
      .select(explode(expr(
        s"""filter(
              flatten(transform(xs, (a, i) ->
                transform(slice(xs, i + 2, size(xs)), b ->
                  named_struct('ib', b.doc_id,
                    'j', size(array_intersect(a.shingles, b.shingles)) /
                         size(array_union(a.shingles, b.shingles)))))),
              p -> p.j >= $minJaccard)""")).as("p"))
      .select(col("p.ib").as("doc_id"))
    exactDup.unionByName(nearDup).distinct()
  }

  /** Band-exploded signature rows (doc_id, band, shingles) — the stored
    * index-row shape, computed by the batch tier's own signature
    * pipeline so the two paths are value-identical by construction.
    * Documents with < ShingleK words yield no rows.
    */
  private[graft] def sigRows(docs: DataFrame): DataFrame =
    TextDedup.signatures(docs)
      .select(col("doc_id"), explode(col("bands")).as("band"),
        col("shingles"))

  /** Open the leg over a durable band index at `indexDir`, seeding it
    * from `standingDocs` ((doc_id, text) — the curated standing corpus)
    * only when the directory holds no index yet — a restart adopts the
    * durable state.
    */
  def apply(verdictSink: BatchSink, standingDocs: => DataFrame,
      indexDir: String, spark: org.apache.spark.sql.SparkSession,
      minJaccard: Double = 0.5): StreamTextDedup = {
    val store = FoldStore.open(spark, indexDir,
      sigRows(standingDocs).withColumn("pk", pkOf), PrefixParts,
      compactAfter = StreamMediaDedup.CompactAfter)
    new StreamTextDedup(verdictSink, store, minJaccard)
  }
}
