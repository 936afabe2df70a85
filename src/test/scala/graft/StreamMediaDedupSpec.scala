package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{AudioDedup, ImageDedup, VideoDedup}
import graft.streaming.{FoldStore, StreamMediaDedup, UpsertSink}

/** Streaming media-dedup leg (the firehose form of the incremental
  * batch contracts): verdict parity with the batch incremental operator
  * over the same standing index + arriving batch for ALL THREE
  * modalities (image/audio banded hamming, video frame-set
  * containment), index folding across micro-batches (batch N+1 sees
  * batch N's canonical assets), the undecodable contract, and dup
  * fingerprints staying out of the index.
  */
class StreamMediaDedupSpec extends AnyFunSuite with Matchers with TestSpark {

  private val n = 12

  private def standingHashes = ImageDedup.hashRows(
    ImageDedup.imageTable(spark, n))

  private def collectVerdicts(sink: UpsertSink) = {
    import scala.jdk.CollectionConverters._
    sink.store.values().asScala.map { r =>
      r.getLong(r.fieldIndex("media_id")) ->
        (r.getBoolean(r.fieldIndex("is_dup")),
          if (r.isNullAt(r.fieldIndex("matched_id"))) -1L
          else r.getLong(r.fieldIndex("matched_id")),
          if (r.isNullAt(r.fieldIndex("score"))) Double.NaN
          else r.getDouble(r.fieldIndex("score")))
    }.toMap
  }

  test("streaming verdicts equal the batch incremental operator's best " +
      "matches over the same standing index and arriving batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // batch truth over the SAME merged frame the batch query uses
    val merged = standingHashes.unionByName(
      ImageDedup.hashRows(ImageDedup.incrementTable(spark, n)))
    val batchBest = ImageDedup.imageDupsIncremental(merged)
      .collect()
      .map(r => (r.getLong(1), (r.getLong(2), r.getLong(0)))) // new -> (ham, idx)
      .groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).min }

    val sink = new UpsertSink("media_key")
    val leg = StreamMediaDedup.image(sink, standingHashes,
      java.nio.file.Files.createTempDirectory("smd-ix").toString)
    val in = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = leg.start(in.toDF().toDF("media_id", "payload", "ts"),
      java.nio.file.Files.createTempDirectory("smd-ck").toString)
    try {
      val t0 = new Timestamp(1700000000000L)
      in.addData(ImageDedup.incrementTable(spark, n).collect()
        .map(r => (r.getLong(0), r.getAs[Array[Byte]](1), t0)).toSeq)
      q.processAllAvailable()

      val verdicts = collectVerdicts(sink)
      // every arriving asset got exactly one verdict
      verdicts.keySet shouldBe
        (0L until n.toLong).filter(_ % 3 != 2)
          .map(ImageDedup.NewMediaBase + _).toSet
      // dup set and best matches equal the batch operator's
      verdicts.foreach { case (id, (isDup, matched, score)) =>
        batchBest.get(id) match {
          case Some((bHam, bIdx)) =>
            isDup shouldBe true
            matched shouldBe bIdx
            score shouldBe bHam.toDouble
          case None =>
            isDup shouldBe false
            matched shouldBe -1L
        }
      }
    } finally { q.stop(); leg.close() }
  }

  test("the index folds across batches: a later re-upload of a batch-1 " +
      "asset is flagged against it; dups and undecodables never enter " +
      "the index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val sink = new UpsertSink("media_key")
    val leg = StreamMediaDedup.image(sink, standingHashes,
      java.nio.file.Files.createTempDirectory("smd-ix2").toString)
    val size0 = leg.indexSize
    val in = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = leg.start(in.toDF().toDF("media_id", "payload", "ts"),
      java.nio.file.Files.createTempDirectory("smd-ck2").toString)
    try {
      val t0 = new Timestamp(1700000000000L)
      // batch 1: one genuinely new image (g=1 is a 3k+1 group) + one
      // re-ingest dup (g=0) + one undecodable payload
      val newId = ImageDedup.NewMediaBase + 1
      in.addData(Seq(
        (newId, ImageDedup.encodeIncrement(1), t0),
        (ImageDedup.NewMediaBase + 0, ImageDedup.encodeIncrement(0), t0),
        (ImageDedup.NewMediaBase + 500, Array[Byte](1, 2, 3), t0)))
      q.processAllAvailable()
      // only the genuinely new asset's fingerprint folded in
      leg.indexSize shouldBe size0 + 1

      // batch 2: the SAME new image re-uploaded under a fresh id must
      // match the batch-1 asset (the fold made it standing)
      val reId = ImageDedup.NewMediaBase + 1001
      in.addData(Seq((reId, ImageDedup.encodeIncrement(1), t0)))
      q.processAllAvailable()

      val byId = collectVerdicts(sink)
      byId(reId)._1 shouldBe true
      byId(reId)._2 shouldBe newId
      val und = byId(ImageDedup.NewMediaBase + 500)
      und._1 shouldBe false
      import scala.jdk.CollectionConverters._
      val undRow = sink.store.values().asScala
        .find(r => r.getLong(r.fieldIndex("media_id")) ==
          ImageDedup.NewMediaBase + 500).get
      undRow.getBoolean(undRow.fieldIndex("decoded")) shouldBe false
      // the re-upload (a dup) did not fold in
      leg.indexSize shouldBe size0 + 1
    } finally { q.stop(); leg.close() }
  }

  test("a replayed micro-batch re-emits verdicts but folds nothing: the " +
      "index stays single-copy so containment counts cannot inflate") {
    import spark.implicits._
    val sink = new UpsertSink("media_key")
    val leg = StreamMediaDedup.image(sink, standingHashes,
      java.nio.file.Files.createTempDirectory("smd-ix3").toString)
    val size0 = leg.indexSize
    val batch = Seq(
        (ImageDedup.NewMediaBase + 1, ImageDedup.encodeIncrement(1),
          new Timestamp(1700000000000L)))
      .toDF("media_id", "payload", "ts")
    try {
      leg.processBatch(batch, 7L)
      leg.indexSize shouldBe size0 + 1
      // at-least-once re-delivery of the SAME batch id
      leg.processBatch(batch, 7L)
      leg.indexSize shouldBe size0 + 1
      sink.size shouldBe 1 // keyed sink absorbed the re-emit
    } finally leg.close()
  }

  test("the leg is modality-generic: the audio fingerprint family runs " +
      "through the same pipeline with batch-parity verdicts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val standing = AudioDedup.hashRows(AudioDedup.audioTable(spark, n))
    val merged = standing.unionByName(
      AudioDedup.hashRows(AudioDedup.incrementTable(spark, n)))
    val batchDups = AudioDedup.audioDupsIncremental(merged)
      .collect().map(_.getLong(1)).toSet

    val sink = new UpsertSink("media_key")
    val leg = StreamMediaDedup.audio(sink, standing,
      java.nio.file.Files.createTempDirectory("smd-ix4").toString)
    val in = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = leg.start(in.toDF().toDF("media_id", "payload", "ts"),
      java.nio.file.Files.createTempDirectory("smd-ck3").toString)
    try {
      in.addData(AudioDedup.incrementTable(spark, n).collect()
        .map(r => (r.getLong(0), r.getAs[Array[Byte]](1),
          new Timestamp(1700000000000L))).toSeq)
      q.processAllAvailable()
      val dupIds = collectVerdicts(sink).filter(_._2._1).keySet
      dupIds shouldBe batchDups
    } finally { q.stop(); leg.close() }
  }

  test("the standing index survives a restart: a NEW leg over the same " +
      "index dir recovers the folds and the replay guard, so pre-crash " +
      "assets stay flagged and committed batches never refold") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("smd-restart").toString
    val t0 = new Timestamp(1700000000000L)
    val newId = ImageDedup.NewMediaBase + 1
    val batch = Seq((newId, ImageDedup.encodeIncrement(1), t0))
      .toDF("media_id", "payload", "ts")

    val sink1 = new UpsertSink("media_key")
    val leg1 = StreamMediaDedup.image(sink1, standingHashes, dir)
    val size0 = leg1.indexSize
    leg1.processBatch(batch, 3L)
    leg1.indexSize shouldBe size0 + 1
    leg1.close()

    // "restart": a fresh leg instance over the same directory — the
    // standing-index argument must NOT be re-seeded over the folds
    val sink2 = new UpsertSink("media_key")
    val leg2 = StreamMediaDedup.image(sink2, standingHashes, dir)
    leg2.indexSize shouldBe size0 + 1
    leg2.store.lastFoldedId shouldBe 3L

    // a replayed pre-crash batch folds nothing (durable guard)
    leg2.processBatch(batch, 3L)
    leg2.indexSize shouldBe size0 + 1

    // a re-upload of the pre-crash asset is flagged against it — the
    // exact data loss the in-memory leaf chain had on restart
    val reId = ImageDedup.NewMediaBase + 1001
    leg2.processBatch(
      Seq((reId, ImageDedup.encodeIncrement(1), t0))
        .toDF("media_id", "payload", "ts"), 4L)
    val byId = collectVerdicts(sink2)
    byId(reId)._1 shouldBe true
    byId(reId)._2 shouldBe newId
    leg2.close()
  }

  test("end-to-end checkpoint restart: a NEW leg and a NEW streaming " +
      "query over the same checkpoint + index dirs resume from the " +
      "recorded offset, see pre-restart folds, and refold nothing") {
    import spark.implicits._
    import java.nio.file.{Files => JF, StandardCopyOption}
    val watch = JF.createTempDirectory("smd-e2e-in")
    val ck = JF.createTempDirectory("smd-e2e-ck").toString
    val ixDir = JF.createTempDirectory("smd-e2e-ix").toString
    val t0 = new Timestamp(1700000000000L)
    def deliver(name: String, rows: Seq[(Long, Array[Byte], Timestamp)]):
        Unit = {
      val stage = JF.createTempDirectory("smd-e2e-stage")
      rows.toDF("media_id", "payload", "ts")
        .coalesce(1).write.parquet(stage.resolve("b").toString)
      val s = JF.list(stage.resolve("b"))
      try s.iterator().forEachRemaining { p =>
        if (p.getFileName.toString.endsWith(".parquet")) {
          JF.move(p, watch.resolve(name + ".parquet"),
            StandardCopyOption.ATOMIC_MOVE)
          ()
        }
      } finally s.close()
    }
    def source = spark.readStream
      .schema("media_id LONG, payload BINARY, ts TIMESTAMP")
      .parquet(watch.toString)

    val newId = ImageDedup.NewMediaBase + 1
    val sink1 = new UpsertSink("media_key")
    val leg1 = StreamMediaDedup.image(sink1, standingHashes, ixDir)
    val size0 = leg1.indexSize
    val q1 = leg1.start(source, ck)
    try {
      deliver("b1", Seq((newId, ImageDedup.encodeIncrement(1), t0)))
      q1.processAllAvailable()
    } finally { q1.stop(); leg1.close() }
    // the fold committed durably before the "crash" (the probe store
    // must release the writer lock before the restarted leg opens)
    val probe = FoldStore.open(spark, ixDir, fail("seed must not re-evaluate"))
    try probe.lastFoldedId should be >= 0L finally probe.close()

    // restart: fresh leg instance + fresh query, same ck + index dirs
    val sink2 = new UpsertSink("media_key")
    val leg2 = StreamMediaDedup.image(sink2, standingHashes, ixDir)
    leg2.indexSize shouldBe size0 + 1
    val q2 = leg2.start(source, ck)
    try {
      val reId = ImageDedup.NewMediaBase + 1001
      val otherId = ImageDedup.NewMediaBase + 4 // 3k+1 group: genuinely new
      deliver("b2", Seq(
        (reId, ImageDedup.encodeIncrement(1), t0),
        (otherId, ImageDedup.encodeIncrement(4), t0)))
      q2.processAllAvailable()
      // only the post-restart file was processed (offsets recovered,
      // b1 not re-delivered), and the pre-restart fold is visible
      val v = collectVerdicts(sink2)
      v.keySet shouldBe Set(reId, otherId)
      v(reId)._1 shouldBe true
      v(reId)._2 shouldBe newId
      v(otherId)._1 shouldBe false
      leg2.indexSize shouldBe size0 + 2 // b1's asset + otherId, no refold
    } finally { q2.stop(); leg2.close() }
  }

  test("the video modality streams through the containment pairing: " +
      "verdicts equal the batch incremental operator's best overlaps, " +
      "and per-clip multi-row fingerprints do not explode verdicts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val standing = VideoDedup.hashRows(VideoDedup.videoTable(spark, n))
    val merged = standing.unionByName(
      VideoDedup.hashRows(VideoDedup.incrementTable(spark, n)))
    val batchBest = VideoDedup.videoDupsIncremental(merged)
      .collect()
      .map(r => (r.getLong(1), (-r.getDouble(2), r.getLong(0))))
      .groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).min } // max overlap, min id

    val sink = new UpsertSink("media_key")
    val leg = StreamMediaDedup.video(sink, standing,
      java.nio.file.Files.createTempDirectory("smd-ix5").toString)
    val in = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = leg.start(in.toDF().toDF("media_id", "payload", "ts"),
      java.nio.file.Files.createTempDirectory("smd-ck4").toString)
    try {
      in.addData(VideoDedup.incrementTable(spark, n).collect()
        .map(r => (r.getLong(0), r.getAs[Array[Byte]](1),
          new Timestamp(1700000000000L))).toSeq)
      q.processAllAvailable()
      val verdicts = collectVerdicts(sink)
      // one verdict per arriving clip, never one per frame hash
      verdicts.keySet shouldBe
        (0L until n.toLong).filter(_ % 3 != 2)
          .map(VideoDedup.NewMediaBase + _).toSet
      verdicts.foreach { case (id, (isDup, matched, score)) =>
        batchBest.get(id) match {
          case Some((negOv, bIdx)) =>
            isDup shouldBe true
            matched shouldBe bIdx
            score shouldBe -negOv
          case None =>
            isDup shouldBe false
        }
      }
    } finally { q.stop(); leg.close() }
  }
}
