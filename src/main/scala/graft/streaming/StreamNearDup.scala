package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.{TextDedup, TextHash}

/** Streaming MinHash/LSH near-duplicate detection — the firehose shape of
  * the batch [[graft.ops.TextDedup.minhashPairsOf]] contract: every
  * arriving document is checked against the in-window band index and the
  * matches surface AS THE STREAM RUNS, instead of in a nightly batch pass.
  *
  * Topology: stateless signature computation (the same codegen'd native
  * [[graft.functions.MinHashSig]] the batch path uses, so batch/streaming
  * signatures are value-identical by construction) -> explode band keys ->
  * flatMapGroupsWithState KEYED BY BAND holding the bucket's members ->
  * per-band candidate pairs scored by minhash agreement. Cross-band
  * single emission needs NO second stateful operator: both members'
  * signatures are in hand at emission time, so each bucket emits a pair
  * only when ITS band index is the pair's FIRST agreeing band — every
  * matching pair has exactly one such band, giving exactly-once emission
  * from plain per-band logic (a downstream dedup operator would trip
  * Spark's multi-stateful global-watermark correctness check here,
  * because arbitrary stateful output can be late for the next state op).
  *
  * State bound: one list per ACTIVE band bucket, capped at `maxBucket`
  * members of (doc_id, 16 minhash longs) each — the streaming analogue of
  * the batch LSH hot-bucket cap (a boilerplate band stops admitting
  * members at the cap instead of retro-dropping, since emitted pairs
  * cannot be unsent). CAP DIVERGENCE FROM BATCH, stated precisely: a
  * pair whose FIRST agreeing band's bucket was saturated when either
  * member arrived is LOST — the saturated bucket never holds both
  * members, and every later agreeing band skips the pair because the
  * first-agreeing-band rule assigns emission elsewhere. The batch pass
  * differs: it drops the hot bucket wholesale but still surfaces the
  * pair through any uncapped agreeing band. The cap-aware rule ("first
  * agreeing band that admitted both members") is NOT locally computable
  * in a per-band state operator — a band cannot observe another band's
  * occupancy, and routing admission facts through a second stateful
  * operator trips Spark's multi-stateful global-watermark check — so
  * the divergence is accepted and pinned by spec
  * (`StreamNearDupSpec`: "a pair whose first agreeing band is capped is
  * dropped"). Operationally: near `maxBucket` members of one band key
  * inside one watermark window is boilerplate territory, where batch
  * recall is already deliberately sacrificed; genuinely distinct
  * near-dup pairs overwhelmingly agree on an unsaturated first band.
  * Buckets are evicted by event-time
  * timeout `delay` after their newest member, so state is bounded by the
  * window, never by stream history — a pair whose members arrive more
  * than `delay` apart is NOT reported, which is the contract of windowed
  * streaming dedup (the standing-index batch path
  * [[graft.ops.TextDedup.incrementalDups]] covers cross-window history).
  */
object StreamNearDup {

  final case class BandMember(docId: Long, mh: Seq[Long], tsMs: Long)
  final case class Bucket(members: List[BandMember])
  final case class CandPair(doc_a: Long, doc_b: Long, est_jaccard: Double,
      ts: java.sql.Timestamp)

  /** `docs`: streaming frame with (doc_id long, text string, ts timestamp).
    * Returns append-mode (doc_a, doc_b, est_jaccard, ts) with doc_a <
    * doc_b and est >= `minEst` — ts is the event time of the later-arrived
    * member, so downstream windows see the detection at the moment the
    * duplicate entered the stream.
    */
  def nearDups(docs: DataFrame, delay: String = "2 hours",
      maxBucket: Int = TextDedup.MaxBucket,
      minEst: Double = 0.5): DataFrame = {
    val delayMs = Streams.parseDelayMs(delay)
    import docs.sparkSession.implicits._

    val banded = docs
      .withWatermark("ts", delay)
      .filter(size(TextHash.words(col("text"))) >= TextDedup.ShingleK)
      .withColumn("mh", graft.functions.MinHashSig(lower(col("text"))))
      .select(
        explode(TextHash.bandKeys(col("mh"), TextDedup.Bands,
          TextDedup.BandRows)).as("band"),
        col("doc_id"), col("mh"),
        // the WATERMARKED timestamp column must reach the stateful
        // operator as-is — Spark tracks the event-time watermark via
        // this column's metadata, and EventTimeTimeout refuses plans
        // where no watermarked column survives to the state op
        col("ts"))
      .as[(String, Long, Seq[Long], java.sql.Timestamp)]

    val k = TextDedup.MinhashK
    val bandRows = TextDedup.BandRows
    val nBands = TextDedup.Bands
    def est(a: Seq[Long], b: Seq[Long]): Double = {
      var i = 0; var eq = 0
      while (i < k) { if (a(i) == b(i)) eq += 1; i += 1 }
      eq.toDouble / k
    }
    // smallest band index on which the two signatures agree row-for-row
    def firstAgreeingBand(a: Seq[Long], b: Seq[Long]): Int = {
      var bnd = 0
      while (bnd < nBands) {
        var r = 0
        var agree = true
        while (r < bandRows) {
          if (a(bandRows * bnd + r) != b(bandRows * bnd + r)) agree = false
          r += 1
        }
        if (agree) return bnd
        bnd += 1
      }
      -1 // unreachable for two members of the same bucket
    }

    banded
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (band: String,
            rows: Iterator[(String, Long, Seq[Long], java.sql.Timestamp)],
            state: GroupState[Bucket]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val bandIdx = band.substring(0, band.indexOf(':')).toInt
            // deterministic intra-batch order: event time, then doc_id
            val batch = rows.toVector
              .map(r => (r._1, r._2, r._3, r._4.getTime))
              .sortBy(r => (r._4, r._2))
            var members = state.getOption.map(_.members).getOrElse(Nil)
            val out = Vector.newBuilder[CandPair]
            batch.foreach { case (_, docId, mh, tsMs) =>
              if (members.size < maxBucket &&
                  !members.exists(_.docId == docId)) {
                members.foreach { m =>
                  val e = est(m.mh, mh)
                  if (e >= minEst && firstAgreeingBand(m.mh, mh) == bandIdx)
                    out += CandPair(math.min(m.docId, docId),
                      math.max(m.docId, docId), e,
                      new java.sql.Timestamp(tsMs))
                }
                members = BandMember(docId, mh, tsMs) :: members
              }
            }
            state.update(Bucket(members))
            // bucket lives `delay` past its newest member's event time
            val newest = members.iterator.map(_.tsMs).max
            state.setTimeoutTimestamp(math.max(newest + delayMs,
              state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
      .toDF()
  }
}
