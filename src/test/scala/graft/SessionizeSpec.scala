package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Sessionize

/** Gap-based sessionization: session_window semantics on hand-built
  * fixtures — chained events merge, a gap > the threshold splits; the
  * exact-gap event still merges (inclusive end boundary), matching the
  * Sessionize impl and the DuckDB oracle.
  */
class SessionizeSpec extends AnyFunSuite with Matchers with TestSpark {

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  private def eventsOf(rows: (Long, Long, Timestamp, String, Double)*) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  test("events chain while gaps stay under 30 min; a larger gap splits") {
    // user 1: 10:00, 10:20, 10:45 chain (gaps 20, 25 min) then 11:20
    // splits (gap 35 min); user 2: a single event
    val out = Sessionize.sessions(eventsOf(
      (1L, 1L, ts(0), "click", 1.0),
      (2L, 1L, ts(20), "view", 2.0),
      (3L, 1L, ts(45), "click", 3.0),
      (4L, 1L, Timestamp.valueOf("2024-01-01 11:20:00"), "view", 4.0),
      (5L, 2L, ts(5), "purchase", 9.5)))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    out shouldBe Array(
      (1L, ts(0), 3L, 2L, 6.0, 2700.0),
      (1L, Timestamp.valueOf("2024-01-01 11:20:00"), 1L, 0L, 4.0, 0.0),
      (2L, ts(5), 1L, 0L, 9.5, 0.0))
  }

  test("random event streams match a driver-side chaining reference") {
    val rnd = new scala.util.Random(20260813L)
    val gapUs = Sessionize.GapMinutes.toLong * 60L * 1000000L
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 400).map { i =>
      val user = 1L + rnd.nextInt(7)
      // gaps cluster around the threshold to exercise both sides of it
      val t = new Timestamp(base + rnd.nextInt(6 * 3600) * 1000L)
      (i.toLong, user, t,
        if (rnd.nextBoolean()) "click" else "view", rnd.nextInt(100) / 10.0)
    }
    // reference: sort per user, chain while gap <= threshold (inclusive)
    val expected = rows.groupBy(_._2).flatMap { case (user, es) =>
      val sorted = es.sortBy(e => (e._3.getTime, e._1))
      val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Timestamp,
          String, Double)]]) {
        case (acc, e) => acc match {
          case cur :: rest
            if (e._3.getTime - cur.head._3.getTime) * 1000L <= gapUs =>
            (e :: cur) :: rest // cur.head is the session's LAST event
          case _ => List(e) :: acc
        }
      }
      sessions.map { s =>
        val ts = s.map(_._3.getTime)
        (user, new Timestamp(ts.min), new Timestamp(ts.max), s.size.toLong,
          s.count(_._4 == "click").toLong)
      }
    }.toSeq.sortBy(s => (s._1, s._2.getTime))
    val got = Sessionize.sessions(eventsOf(rows: _*))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getLong(4))).toSeq
    got shouldBe expected
  }

  test("streaming session_window over real events matches batch " +
      "sessionize exactly") {
    // the operator doc's core claim: the SAME grouping expression
    // sessionizes the stream — proven by value on real testdata
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val batch = Sessionize.sessions(events).collect()

    // parquet staging: JSON's default timestamp format truncates to
    // milliseconds, silently shifting exact-gap boundaries
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-par")
    events.coalesce(4).write.mode("overwrite")
      .parquet(dir.resolve("in").toString)
    val streamed = spark.readStream.schema(events.schema)
      .parquet(dir.resolve("in").toString)
      .groupBy(col("user_id"),
        session_window(col("ts"),
          s"${Sessionize.GapMinutes} minutes").as("_w"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("n_clicks"),
        round(sum(col("value")), 2).as("total_value"))
    val q = streamed.writeStream.format("memory")
      .queryName("sess_parity").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sess_parity")
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("n_clicks"), col("total_value"))
        .orderBy("user_id", "session_start").collect()
      got.length shouldBe batch.length
      got.zip(batch).foreach { case (s, b) =>
        (0 until 6).foreach(i => s.get(i) shouldBe b.get(i))
      }
    } finally q.stop()
  }

  test("the exact 30-min gap still merges (inclusive end); " +
      "one second over splits") {
    val out = Sessionize.sessions(eventsOf(
      (1L, 1L, ts(0), "view", 1.0),
      (2L, 1L, ts(30), "view", 1.0), // exactly gap -> merges
      (3L, 3L, ts(0), "view", 1.0),
      (4L, 3L, Timestamp.valueOf("2024-01-01 10:30:01"), "view", 1.0)))
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    out shouldBe Array((1L, 2L), (3L, 1L), (3L, 1L))
  }
}
