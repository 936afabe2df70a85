package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Relational

/** Banded interval join: the bucket-expand rewrite must reproduce the
  * plain range-join semantics (ts ∈ [hour+30min, hour+75min)) exactly,
  * including events in the bucket-crossing tail of a window and events
  * matched by a NEIGHBOR hour's window, while planning as a broadcast
  * HASH join (no BNLJ — PlanAuditSpec enforces that registry-wide).
  */
class RangeJoinSpec extends AnyFunSuite with Matchers with TestSpark {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def eventsOf(rows: (Long, Long, Timestamp, String, Double)*) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  test("hand fixture: inside, boundary, crossing, and cross-hour matches") {
    // hours present: 10:00 (from e1/e2/e3/e4) and 11:00 (from e5)
    // window(10:00) = [10:30, 11:15); window(11:00) = [11:30, 12:15)
    val out = Relational.promoAttribOf(eventsOf(
      (1L, 1L, ts("2024-01-01 10:05:00"), "click", 1.0), // before 10:30 — no match
      (2L, 1L, ts("2024-01-01 10:30:00"), "click", 2.0), // w10 start (inclusive)
      (3L, 1L, ts("2024-01-01 10:59:00"), "click", 4.0), // w10, first bucket
      (4L, 1L, ts("2024-01-01 11:10:00"), "click", 8.0), // w10 tail bucket (cross-hour event)
      (5L, 2L, ts("2024-01-01 11:15:00"), "view", 16.0), // exactly w10 end — excluded
      (6L, 2L, ts("2024-01-01 11:40:00"), "view", 32.0)) // w11
    ).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    val h10 = ts("2024-01-01 10:00:00").getTime / 3600000L
    out shouldBe Array(
      (h10, 3L, 14.0),
      (h10 + 1, 1L, 32.0))
  }

  test("rewrite equals the naive range join on real data") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val wins = ev.select(date_trunc("hour", col("ts")).as("h")).distinct()
      .select(expr("unix_micros(h) div 3600000000").as("promo_id"),
        (col("h") + expr("INTERVAL 30 MINUTES")).as("w_start"),
        (col("h") + expr("INTERVAL 75 MINUTES")).as("w_end"))
    val naive = ev.join(wins,
        col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy("promo_id")
      .agg(count(lit(1)).as("n_events"),
        round(Relational.qsum(col("value"), 1000000), 2).as("sum_value"))
    val got = Relational.promoAttrib(spark, "/root/testdata/sf0.001")
    got.exceptAll(naive).count() shouldBe 0L
    naive.exceptAll(got).count() shouldBe 0L
    got.count() should be > 0L
  }
}
