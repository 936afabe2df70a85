package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.TimeWindows

/** Hopping-window semantics: every event lands in exactly size/slide = 2
  * windows, starts are epoch-aligned to the 30-min slide, and an event
  * sitting exactly on a slide boundary belongs to the window STARTING
  * there plus the preceding one (half-open [start, end) windows).
  */
class TimeWindowsSpec extends AnyFunSuite with Matchers with TestSpark {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def eventsOf(rows: (Long, Long, Timestamp, String, Double)*) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  test("hand fixture: alignment, overlap, and boundary membership") {
    // 10:15 → windows starting 09:30 and 10:00
    // 10:30 (exact slide boundary) → windows 10:00 and 10:30
    // 10:59:59 → windows 10:00 and 10:30
    val out = TimeWindows.hopping(eventsOf(
      (1L, 1L, ts("2024-01-01 10:15:00"), "click", 1.0),
      (2L, 2L, ts("2024-01-01 10:30:00"), "click", 2.0),
      (3L, 1L, ts("2024-01-01 10:59:59"), "click", 4.0)))
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    out shouldBe Array(
      ("2024-01-01 09:30:00.0", 1L, 1L, 1.0),
      ("2024-01-01 10:00:00.0", 3L, 2L, 7.0),
      ("2024-01-01 10:30:00.0", 2L, 2L, 6.0))
  }

  test("every event contributes to exactly 2 windows on real data") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val agg = TimeWindows.hopping(ev)
    val total = agg.agg(org.apache.spark.sql.functions.sum("n_events"))
      .head.getLong(0)
    total shouldBe 2L * ev.count()
  }

  test("streaming hoppingStats matches batch hopping exactly on real " +
      "events (count + value sum surface)") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val batch = TimeWindows.hopping(events)
      .select("window_start", "event_type", "n_events", "total_value")
      .collect()
    val dir = java.nio.file.Files.createTempDirectory("graft-hop-par")
    events.coalesce(4).write.mode("overwrite")
      .parquet(dir.resolve("in").toString)
    val streamed = graft.streaming.Streams.hoppingStats(
      spark.readStream.schema(events.schema)
        .parquet(dir.resolve("in").toString))
    val q = streamed.writeStream.format("memory")
      .queryName("hop_parity").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hop_parity")
        .orderBy("window_start", "event_type").collect()
      got.length shouldBe batch.length
      got.zip(batch).foreach { case (s, b) =>
        (0 until 4).foreach(i => s.get(i) shouldBe b.get(i))
      }
    } finally q.stop()
  }

  test("window starts sit on the 30-min slide grid") {
    import org.apache.spark.sql.functions._
    val starts = TimeWindows.hopping(
      Tables.events(spark, "/root/testdata/sf0.001"))
      .select(col("window_start"))
      .filter(unix_micros(col("window_start")) %
        (TimeWindows.HopSlideMinutes.toLong * 60000000L) =!= 0L)
    starts.count() shouldBe 0L
  }
}
