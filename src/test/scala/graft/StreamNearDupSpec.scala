package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{Corpus, TextDedup}
import graft.streaming.StreamNearDup

/** Streaming MinHash/LSH near-dup detection: exact batch parity on the
  * near-dup corpus across multi-batch arrival, per-pair single emission,
  * and watermark-bounded state.
  */
class StreamNearDupSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  /** Batch truth: minhash-estimate pairs at est >= 0.5 over the same
    * corpus (candidatePairs + minhash agreement — the exact contract the
    * streaming operator mirrors band-for-band).
    */
  private def batchPairs = {
    val sigs = TextDedup.signatures(Corpus.withNearDups(spark, dir))
      .select("doc_id", "shingles", "mh", "bands")
    TextDedup.minhashPairsOf(sigs)
      .filter(col("est_jaccard") >= 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
  }

  test("streaming pairs == batch minhash pairs (est >= 0.5) when the " +
      "corpus arrives across micro-batches, each pair emitted once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = Corpus.withNearDups(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // two arrival waves: originals first, near-copies later (the standing
    // half is in state when the dup wave lands — the service shape)
    val (wave2, wave1) = corpus.partition(_._1 >= TextDedup.NewIdBase)

    val in = MemoryStream[(Long, String, Timestamp)]
    val docs = in.toDF().toDF("doc_id", "text", "ts")
    val out = StreamNearDup.nearDups(docs)
    val q = out.writeStream.format("memory").queryName("snd_parity")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      in.addData(wave1.map(d => (d._1, d._2, t0)).toSeq)
      q.processAllAvailable()
      in.addData(wave2.map(d =>
        (d._1, d._2, Timestamp.valueOf("2024-01-01 10:30:00"))).toSeq)
      q.processAllAvailable()
      val got = spark.table("snd_parity").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      // single emission per pair (cross-band duplicates suppressed)
      got.map(_._1).distinct.length shouldBe got.length
      val expected = batchPairs
      expected should not be empty
      got.toMap shouldBe expected
      // detection is stamped with the LATER member's event time
      spark.table("snd_parity").select(min(col("ts"))).head().getTimestamp(0)
        .getTime should be >= t0.getTime
    } finally q.stop()
  }

  test("cap divergence pinned: a pair whose agreeing bands are all " +
      "saturated is dropped, while pre-cap emissions stand (batch would " +
      "drop the hot bucket wholesale)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // four identical docs through cap=2 buckets: F1/F2 fill every band
    // bucket and emit their pair; X and Y arrive at cap, are never
    // admitted, so the (X, Y) pair's first agreeing band (and here every
    // band) is saturated -> the pair is LOST. Batch at the same cap
    // differs in BOTH directions: its bucket holds all four members
    // (size 4 > cap) and is discarded wholesale, so batch emits nothing
    // — streaming keeps (F1, F2) because emitted pairs cannot be unsent.
    val text = (1 to 40).map(i => s"cap$i").mkString(" ")
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val in = MemoryStream[(Long, String, Timestamp)]
    val docs = in.toDF().toDF("doc_id", "text", "ts")
    val out = StreamNearDup.nearDups(docs, maxBucket = 2)
    val q = out.writeStream.format("memory").queryName("snd_cap")
      .outputMode("append").start()
    try {
      in.addData((1L, text, t0))
      q.processAllAvailable()
      in.addData((2L, text, new Timestamp(t0.getTime + 60000L)))
      q.processAllAvailable()
      in.addData((3L, text, new Timestamp(t0.getTime + 120000L)))
      q.processAllAvailable()
      in.addData((4L, text, new Timestamp(t0.getTime + 180000L)))
      q.processAllAvailable()
      val got = spark.table("snd_cap").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      got shouldBe Array((1L, 2L))
    } finally q.stop()
  }

  test("band-bucket state is evicted on watermark: a re-sent original " +
      "no longer pairs with its pre-eviction copy") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    val in = MemoryStream[(Long, String, Timestamp)]
    val docs = in.toDF().toDF("doc_id", "text", "ts")
    val out = StreamNearDup.nearDups(docs, delay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("snd_evict")
      .outputMode("append").start()
    try {
      in.addData((1L, text, Timestamp.valueOf("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // far-future doc advances the watermark past 10:10 -> doc 1 evicted
      in.addData((99L, (100 to 140).map(i => s"z$i").mkString(" "),
        Timestamp.valueOf("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // identical text re-sent: would pair with doc 1 if state survived
      in.addData((2L, text, Timestamp.valueOf("2024-01-01 12:00:30")))
      q.processAllAvailable()
      spark.table("snd_evict").collect() shouldBe empty
      // and within the horizon the same arrival DOES pair
      in.addData((3L, text, Timestamp.valueOf("2024-01-01 12:01:00")))
      q.processAllAvailable()
      val got = spark.table("snd_evict").collect()
      got.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((2L, 3L))
      got.head.getDouble(2) shouldBe 1.0
    } finally q.stop()
  }
}
