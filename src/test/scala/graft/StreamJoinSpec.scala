package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.Streams

/** Stream-stream interval join: boundary semantics on a hand fixture
  * (strictly-after / inclusive +1 h, same as the batch funnel), exact
  * batch/streaming parity on real events, and bounded join state.
  */
class StreamJoinSpec extends AnyFunSuite with Matchers with TestSpark {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def eventsOf(rows: (Long, Long, Timestamp, String, Double)*) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  test("batch semantics: strictly-after lower bound, inclusive +1h upper") {
    val out = Streams.conversionJoin(eventsOf(
      (1L, 1L, ts("2024-01-01 10:00:00"), "click", 0.0),
      // same instant as the click: NOT attributed (strictly after)
      (2L, 1L, ts("2024-01-01 10:00:00"), "purchase", 5.0),
      // exactly +1h: attributed (inclusive upper bound)
      (3L, 1L, ts("2024-01-01 11:00:00"), "purchase", 7.0),
      // +1h 1s: outside the window
      (4L, 1L, ts("2024-01-01 11:00:01"), "purchase", 9.0),
      // other user inside the window: never attributed
      (5L, 2L, ts("2024-01-01 10:30:00"), "purchase", 3.0)))
      .collect().map(r => (r.getLong(0), r.getDouble(4)))
    out shouldBe Array((1L, 7.0))
  }

  test("streaming matches batch exactly on real events") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val batch = Streams.conversionJoin(events)
      .orderBy("click_id", "purchase_ts").collect()
    val dir = java.nio.file.Files.createTempDirectory("graft-ssjoin")
    events.coalesce(4).write.mode("overwrite")
      .parquet(dir.resolve("in").toString)
    val streamed = Streams.conversionJoin(
      spark.readStream.schema(events.schema)
        .parquet(dir.resolve("in").toString))
    val q = streamed.writeStream.format("memory")
      .queryName("ssjoin_parity").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssjoin_parity")
        .orderBy("click_id", "purchase_ts").collect()
      got.length shouldBe batch.length
      batch.length should be > 0
      got.zip(batch).foreach { case (s, b) =>
        (0 until 5).foreach(i => s.get(i) shouldBe b.get(i))
      }
      // the range condition + watermark bound the join state: only rows
      // within the final watermark horizon survive, so the retained count
      // must be strictly below the clicks+purchases actually ingested
      // (an unbounded-state regression would hold every row and fail)
      val ingested = events
        .filter(col("event_type").isin("click", "purchase")).count()
      val prog = q.lastProgress
      val stateRows = prog.stateOperators.map(_.numRowsTotal).sum
      stateRows should be > 0L
      stateRows should be < ingested
    } finally q.stop()
  }

  test("restart from checkpoint: the buffered click side survives and " +
      "joins a purchase arriving in the second incarnation (T1)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Timestamp, String, Double)]
    def frame = in.toDF()
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val base = java.nio.file.Files.createTempDirectory("graft-ssjoin-ckpt")
    val checkpoint = base.resolve("ckpt").toString
    val outDir = base.resolve("out").toString
    // memory sinks cannot recover a checkpoint — a file sink is the
    // restartable shape (and the production one)
    def startQuery() = Streams.conversionJoin(frame)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append").start()
    val q1 = startQuery()
    try {
      in.addData((1L, 1L, ts("2024-01-01 10:00:00"), "click", 0.0))
      q1.processAllAvailable()
      spark.read.parquet(outDir).count() shouldBe 0L // no purchase yet
    } finally q1.stop()

    // second incarnation, SAME checkpoint: the click sits only in the
    // restored join state — if state were lost the purchase would find
    // nothing to attribute to
    val q2 = startQuery()
    try {
      in.addData((2L, 1L, ts("2024-01-01 10:30:00"), "purchase", 9.0))
      q2.processAllAvailable()
      val rows = spark.read.parquet(outDir).collect()
      rows.length shouldBe 1
      rows.head.getAs[Long]("click_id") shouldBe 1L // from incarnation 1
      rows.head.getAs[Double]("value") shouldBe 9.0
    } finally q2.stop()
  }

  test("stream-static anomaly alerts match batch z-scores on closed " +
      "windows") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val moments = graft.ops.Anomaly.moments(events)
    val maxTs = events.agg(max(col("ts"))).head.getTimestamp(0)
    // batch truth: anomalous hours whose window closes under a 0s
    // watermark (hour + 1h <= max event time)
    val expected = graft.ops.Anomaly.hourlyAnomaly(events)
      .filter(col("is_anomaly") &&
        col("hour") + expr("INTERVAL 1 HOUR") <= lit(maxTs))
      .select("event_type", "hour", "n_events", "z_score")
      .orderBy("event_type", "hour").collect()
    expected.length should be > 0
    val dir = java.nio.file.Files.createTempDirectory("graft-ssalert")
    events.coalesce(4).write.mode("overwrite")
      .parquet(dir.resolve("in").toString)
    val alerts = Streams.anomalyAlerts(
      spark.readStream.schema(events.schema)
        .parquet(dir.resolve("in").toString),
      moments, delay = "0 seconds")
    val q = alerts.writeStream.format("memory")
      .queryName("ssalert_parity").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssalert_parity")
        .orderBy("event_type", "hour").collect()
      got.length shouldBe expected.length
      got.zip(expected).foreach { case (s, b) =>
        (0 until 4).foreach(i => s.get(i) shouldBe b.get(i))
      }
    } finally q.stop()
  }
}
