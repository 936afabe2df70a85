package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.EmbedSim
import graft.streaming.{StreamEmbedDedup, UpsertSink}

/** Streaming embedding/semantic-dedup leg (the firehose form of the
  * incremental batch contracts q_embed_dups_incr / q_semdedup_incr):
  * verdict parity with the batch incremental operator over the same
  * frozen centroids + standing assignment + arriving batch, kept-vector
  * folding across micro-batches, restart recovery, and the durable
  * replay guard.
  */
class StreamEmbedDedupSpec extends AnyFunSuite with Matchers
    with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  private def centroids = EmbedSim.ivfCentroids(spark, dir)

  private def asFloatBatch(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions._
    df.select(col("vec_id"),
      col("emb").cast("array<float>").as("embedding"),
      lit(new Timestamp(1700000000000L)).as("ts"))
  }

  private def collectVerdicts(sink: UpsertSink) = {
    import scala.jdk.CollectionConverters._
    sink.store.values().asScala.map { r =>
      r.getLong(r.fieldIndex("vec_id")) ->
        (r.getBoolean(r.fieldIndex("keep")),
          if (r.isNullAt(r.fieldIndex("matched_id"))) -1L
          else r.getLong(r.fieldIndex("matched_id")))
    }.toMap
  }

  test("streaming verdicts equal the batch semDedupIncremental keep " +
      "bits over the same frozen centroids, standing assignment, and " +
      "arriving batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val cents = centroids
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val standing = EmbedSim.standingAssigned(spark, dir, cents)
      val batchKeep = EmbedSim
        .semDedupIncremental(spark, dir, Some(cents), Some(standing))
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap

      val sink = new UpsertSink("vec_key")
      val leg = StreamEmbedDedup(sink, cents, standing,
        java.nio.file.Files.createTempDirectory("sed-ix").toString)
      val in = MemoryStream[(Long, Seq[Float], Timestamp)]
      val q = leg.start(in.toDF().toDF("vec_id", "embedding", "ts"),
        java.nio.file.Files.createTempDirectory("sed-ck").toString)
      try {
        in.addData(asFloatBatch(EmbedSim.embedIncrement(spark, dir))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1), r.getTimestamp(2)))
          .toSeq)
        q.processAllAvailable()

        val verdicts = collectVerdicts(sink)
        verdicts.keySet shouldBe batchKeep.keySet
        verdicts.foreach { case (id, (keep, matched)) =>
          keep shouldBe batchKeep(id)
          if (!keep) matched should be > -1L
        }
        // a dropped planted copy must point at a real clearing match —
        // the planted copies (base + NewVecBase) match their base
        val planted = verdicts.filter(_._1 >= EmbedSim.NewVecBase)
        planted should not be empty
      } finally { q.stop(); leg.close() }
    } finally { cents.unpersist(); () }
  }

  test("kept vectors fold across batches and the index survives a " +
      "restart: a later near-copy of a batch-1 kept vector is dropped " +
      "against it, dropped vectors never fold, and a replayed batch id " +
      "folds nothing — even through a new leg instance") {
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val ixDir = java.nio.file.Files.createTempDirectory("sed-ix2").toString
    val cents = centroids
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val standing = EmbedSim.standingAssigned(spark, dir, cents)
      val sink = new UpsertSink("vec_key")
      val leg = StreamEmbedDedup(sink, cents, standing, ixDir)
      val size0 = leg.indexSize

      // batch 1: one genuinely-new vector (a standing vector rotated far
      // from everything: scale by -1 keeps the norm, flips every cosine)
      // and one near-copy of a standing vector (must be dropped)
      val base = EmbedSim.standingAssigned(spark, dir, cents)
        .orderBy(col("vec_id")).limit(1)
        .select(col("vec_id"), col("emb")).collect().head
      val baseEmb = base.getSeq[Double](1)
      val newId = 900000L
      val b1 = Seq(
        (newId, baseEmb.map(x => -x), new Timestamp(1700000000000L)),
        (900001L, baseEmb.map(x => x + 1e-9),
          new Timestamp(1700000000000L)))
        .toDF("vec_id", "embedding", "ts")
      leg.processBatch(b1, 0L)
      leg.indexSize shouldBe size0 + 1 // only the kept vector folded

      // replay of the same batch id folds nothing
      leg.processBatch(b1, 0L)
      leg.indexSize shouldBe size0 + 1
      leg.close()

      // "restart": a new leg over the same index dir adopts the folds
      val sink2 = new UpsertSink("vec_key")
      val leg2 = StreamEmbedDedup(sink2, cents, standing, ixDir)
      leg2.indexSize shouldBe size0 + 1
      leg2.store.lastFoldedId shouldBe 0L

      // batch 2: a near-copy of the batch-1 KEPT vector must be dropped
      // against it (the fold made it standing, across the restart)
      val b2 = Seq((900002L, baseEmb.map(x => -x),
          new Timestamp(1700000001000L)))
        .toDF("vec_id", "embedding", "ts")
      leg2.processBatch(b2, 1L)
      val v = collectVerdicts(sink2)
      v(900002L)._1 shouldBe false
      v(900002L)._2 shouldBe newId
      leg2.indexSize shouldBe size0 + 1
      leg2.close()
    } finally { cents.unpersist(); () }
  }
}
