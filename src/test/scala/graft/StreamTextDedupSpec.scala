package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{Corpus, TextDedup}
import graft.streaming.{StreamTextDedup, UpsertSink}

/** Streaming standing-index text-dedup leg (the firehose form of
  * q_dedup_incremental): verdict parity with the batch incremental
  * operator over the same standing corpus + arriving batch, canonical
  * folding across micro-batches, restart recovery, the durable replay
  * guard, and the too-short-to-signature contract.
  */
class StreamTextDedupSpec extends AnyFunSuite with Matchers
    with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  private def standingDocs = graft.Tables.load(spark, dir, "documents")
    .select("doc_id", "text")

  private def collectVerdicts(sink: UpsertSink) = {
    import scala.jdk.CollectionConverters._
    sink.store.values().asScala.map { r =>
      r.getLong(r.fieldIndex("doc_id")) ->
        (r.getBoolean(r.fieldIndex("is_dup")),
          if (r.isNullAt(r.fieldIndex("matched_id"))) -1L
          else r.getLong(r.fieldIndex("matched_id")),
          r.getBoolean(r.fieldIndex("has_sig")))
    }.toMap
  }

  test("streaming verdicts equal the batch incremental operator's best " +
      "matches over the same standing corpus and arriving batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // batch truth: the injected near-copies against the originals'
    // standing band index, reduced to (max jaccard, min id) per new doc
    val sigs = TextDedup.signatures(Corpus.withNearDups(spark, dir))
      .select("doc_id", "shingles", "mh", "bands")
    val batchBest = TextDedup.incrementalDups(sigs)
      .collect()
      .map(r => (r.getLong(1), (-r.getDouble(2), r.getLong(0))))
      .groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).min }

    val increment = Corpus.withNearDups(spark, dir)
      .filter(org.apache.spark.sql.functions.col("doc_id") >=
        TextDedup.NewIdBase)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        new Timestamp(1700000000000L))).toSeq

    val sink = new UpsertSink("doc_key")
    val leg = StreamTextDedup(sink, standingDocs,
      java.nio.file.Files.createTempDirectory("std-ix").toString, spark)
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = leg.start(in.toDF().toDF("doc_id", "text", "ts"),
      java.nio.file.Files.createTempDirectory("std-ck").toString)
    try {
      in.addData(increment)
      q.processAllAvailable()
      val verdicts = collectVerdicts(sink)
      // every arriving doc got exactly one verdict
      verdicts.keySet shouldBe increment.map(_._1).toSet
      verdicts.foreach { case (id, (isDup, matched, _)) =>
        batchBest.get(id) match {
          case Some((_, bIdx)) =>
            withClue(s"doc $id: ") {
              isDup shouldBe true
              matched shouldBe bIdx
            }
          case None =>
            withClue(s"doc $id: ") { isDup shouldBe false }
        }
      }
      batchBest should not be empty
    } finally { q.stop(); leg.close() }
  }

  test("canonical docs fold across batches and survive a restart; " +
      "replayed ids fold nothing; too-short docs surface has_sig=false " +
      "and never enter the index") {
    import spark.implicits._
    val ixDir = java.nio.file.Files.createTempDirectory("std-ix2").toString
    val t0 = new Timestamp(1700000000000L)
    // a genuinely new long document, a near-copy of a STANDING doc
    // (doc 0's text with one word changed), and a too-short doc
    val standing0 = standingDocs.orderBy("doc_id").limit(1)
      .collect().head.getString(1)
    val nearCopy = standing0.split(" ").zipWithIndex
      .map { case (w, i) => if (i == 1) "altered" else w }.mkString(" ")
    val newText = (1 to 60).map(i => s"w${i * 977 % 9973}").mkString(" ")
    val newId = 500000L

    val sink = new UpsertSink("doc_key")
    val leg = StreamTextDedup(sink, standingDocs, ixDir, spark)
    val size0 = leg.indexSize
    val b1 = Seq(
      (newId, newText, t0),
      (500001L, nearCopy, t0),
      (500002L, "too short", t0)).toDF("doc_id", "text", "ts")
    leg.processBatch(b1, 0L)
    val v1 = collectVerdicts(sink)
    v1(500001L)._1 shouldBe true
    v1(500002L)._3 shouldBe false // no signature
    v1(newId)._1 shouldBe false
    leg.indexSize shouldBe size0 + 1 // only the new doc folded

    // replay of the same batch id folds nothing
    leg.processBatch(b1, 0L)
    leg.indexSize shouldBe size0 + 1
    leg.close()

    // restart: a new leg adopts the durable folds + replay guard
    val sink2 = new UpsertSink("doc_key")
    val leg2 = StreamTextDedup(sink2, standingDocs, ixDir, spark)
    leg2.indexSize shouldBe size0 + 1
    leg2.store.lastFoldedId shouldBe 0L

    // a near-copy of the batch-1 KEPT doc is flagged against it
    val b2 = Seq((500003L, newText + " tail", t0))
      .toDF("doc_id", "text", "ts")
    leg2.processBatch(b2, 1L)
    val v2 = collectVerdicts(sink2)
    v2(500003L)._1 shouldBe true
    v2(500003L)._2 shouldBe newId
    leg2.close()
  }

  test("within-batch near-dups fold only their min-id member: the " +
      "standing index cannot accrete both copies as canonical, and a " +
      "later near-copy is flagged against the min-id one") {
    import spark.implicits._
    val ixDir = java.nio.file.Files.createTempDirectory("std-ix3").toString
    val t0 = new Timestamp(1700000000000L)
    val textA = (1 to 60).map(i => s"z${i * 991 % 9973}").mkString(" ")
    val textB = (1 to 60).map(i => s"y${i * 983 % 9973}").mkString(" ")

    val sink = new UpsertSink("doc_key")
    val leg = StreamTextDedup(sink, standingDocs, ixDir, spark)
    val size0 = leg.indexSize
    // one batch carrying TWO near-copies of the same new content (A and
    // A+tail) plus an unrelated new doc B
    val b1 = Seq(
      (600000L, textA, t0),
      (600001L, textA + " tail", t0),
      (600002L, textB, t0)).toDF("doc_id", "text", "ts")
    leg.processBatch(b1, 0L)
    // verdicts: within-batch pairs are StreamNearDup's surface, not
    // this leg's — neither A copy is flagged against the OTHER here
    val v1 = collectVerdicts(sink)
    v1(600000L)._1 shouldBe false
    v1(600001L)._1 shouldBe false
    v1(600002L)._1 shouldBe false
    // but the FOLD kept only min-id A and B: not both A copies
    leg.indexSize shouldBe size0 + 2

    // a later near-copy of A is flagged against the min-id member
    val b2 = Seq((600003L, textA + " coda", t0)).toDF("doc_id", "text", "ts")
    leg.processBatch(b2, 1L)
    val v2 = collectVerdicts(sink)
    v2(600003L)._1 shouldBe true
    v2(600003L)._2 shouldBe 600000L
    leg.close()
  }
}
