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

  test("left-outer: unmatched clicks emit EXACTLY ONCE on watermark " +
      "expiry, matched ones with their purchase") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val streamed = Streams.conversionJoinLeft(in.toDF()
      .toDF("event_id", "user_id", "ts", "event_type", "value"))
    val q = streamed.writeStream.format("memory")
      .queryName("ssjoin_left").outputMode("append").start()
    try {
      in.addData(
        (1L, 1L, ts("2024-01-01 10:00:00"), "click", 0.0),
        (2L, 2L, ts("2024-01-01 10:05:00"), "click", 0.0),
        (3L, 1L, ts("2024-01-01 10:30:00"), "purchase", 5.0))
      q.processAllAvailable()
      // user 2's click window [10:05, 11:05] is still open: no verdict yet
      def rowsFor(id: Long) = spark.table("ssjoin_left")
        .filter(col("click_id") === id).collect()
      rowsFor(2L).length shouldBe 0
      // sentinels push BOTH watermarks past 11:05 -> the window closes
      in.addData(
        (90L, 99L, ts("2024-01-01 14:00:00"), "click", 0.0),
        (91L, 98L, ts("2024-01-01 14:00:00"), "purchase", 1.0))
      q.processAllAvailable()
      val matched = rowsFor(1L)
      matched.length shouldBe 1
      matched.head.getAs[Boolean]("converted") shouldBe true
      matched.head.getAs[Double]("value") shouldBe 5.0
      val unmatched = rowsFor(2L)
      unmatched.length shouldBe 1
      unmatched.head.getAs[Boolean]("converted") shouldBe false
      unmatched.head.getAs[Timestamp]("purchase_ts") shouldBe null
      // further watermark advances must NOT re-emit the closed verdict
      in.addData((92L, 97L, ts("2024-01-01 16:00:00"), "click", 0.0))
      q.processAllAvailable()
      rowsFor(2L).length shouldBe 1
    } finally q.stop()
  }

  test("left-outer streaming matches the batch left join exactly on " +
      "closed windows (real events + window-closing sentinels)") {
    import org.apache.spark.sql.functions._
    val base = Tables.events(spark, "/root/testdata/sf0.001")
    val maxTs = base.agg(max(col("ts"))).head.getTimestamp(0)
    val far = new Timestamp(maxTs.getTime + 3L * 24 * 3600 * 1000)
    import spark.implicits._
    // one sentinel click + purchase for an out-of-band user close every
    // real window once both watermarks pass maxTs + 1h
    val sentinels = Seq(
      (900000001L, -1L, far, "click", 0.0),
      (900000002L, -2L, far, "purchase", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val events = base
      .select("event_id", "user_id", "ts", "event_type", "value")
      .unionAll(sentinels)
    val batch = Streams.conversionJoinLeft(events)
      .filter(col("user_id") >= 0) // sentinel windows never close
      .orderBy("click_id", "purchase_ts").collect()
    batch.length should be > 0
    batch.exists(r => !r.getAs[Boolean]("converted")) shouldBe true
    val dir = java.nio.file.Files.createTempDirectory("graft-ssjoin-left")
    events.coalesce(4).write.mode("overwrite")
      .parquet(dir.resolve("in").toString)
    val q = Streams.conversionJoinLeft(
        spark.readStream.schema(events.schema)
          .parquet(dir.resolve("in").toString))
      .writeStream.format("memory")
      .queryName("ssjoin_left_parity").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssjoin_left_parity")
        .filter(col("user_id") >= 0)
        .orderBy("click_id", "purchase_ts").collect()
      got.length shouldBe batch.length
      got.zip(batch).foreach { case (s, b) =>
        (0 until 6).foreach(i => s.get(i) shouldBe b.get(i))
      }
    } finally q.stop()
  }

  test("left-outer restart from checkpoint: the pending unmatched click " +
      "survives and its verdict emits exactly once in the second " +
      "incarnation (T1)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Timestamp, String, Double)]
    def frame = in.toDF()
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val base = java.nio.file.Files.createTempDirectory("graft-ssjoin-lckpt")
    val checkpoint = base.resolve("ckpt").toString
    val outDir = base.resolve("out").toString
    def startQuery() = Streams.conversionJoinLeft(frame)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append").start()
    val q1 = startQuery()
    try {
      in.addData((1L, 1L, ts("2024-01-01 10:00:00"), "click", 0.0))
      q1.processAllAvailable()
      spark.read.parquet(outDir).count() shouldBe 0L // window still open
    } finally q1.stop()

    // second incarnation, SAME checkpoint: only the restored state knows
    // the click exists — the sentinels close its window and the
    // unmatched verdict must emit here, exactly once
    val q2 = startQuery()
    try {
      in.addData(
        (90L, 99L, ts("2024-01-01 14:00:00"), "click", 0.0),
        (91L, 98L, ts("2024-01-01 14:00:00"), "purchase", 1.0))
      q2.processAllAvailable()
      val rows = spark.read.parquet(outDir)
        .filter(org.apache.spark.sql.functions.col("click_id") === 1L)
        .collect()
      rows.length shouldBe 1
      rows.head.getAs[Boolean]("converted") shouldBe false
      rows.head.getAs[Timestamp]("purchase_ts") shouldBe null
    } finally q2.stop()
  }
}
