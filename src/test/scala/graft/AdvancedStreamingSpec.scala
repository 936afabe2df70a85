package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Streaming surfaces beyond the reference's tumbling windows (SURVEY T3
  * notes them unused-but-available): session windows and watermarked
  * stream-stream joins.
  */
class AdvancedStreamingSpec extends AnyFunSuite with Matchers with TestSpark {

  private case class Ev(user_id: Long, kind: String, ts: Timestamp, value: Double)
  private def ev(u: Long, kind: String, t: String, v: Double = 1.0) =
    Ev(u, kind, Timestamp.valueOf(t), v)

  test("session windows close after the gap and aggregate per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val sessions = in.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total"))
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode("complete").start()
    try {
      in.addData(
        ev(1, "view", "2024-01-01 10:00:00"),
        ev(1, "view", "2024-01-01 10:05:00"), // same session (gap < 10m)
        ev(1, "view", "2024-01-01 10:30:00"), // new session
        ev(2, "view", "2024-01-01 10:00:00"))
      q.processAllAvailable()
      val rows = spark.table("sessions_out")
        .select("user_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      rows.toSeq shouldBe Seq((1L, 1L), (1L, 2L), (2L, 1L))
    } finally q.stop()
  }

  test("watermarked stream-stream join: purchases within 30m of a click") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val c = clicks.toDF().select(col("user_id").as("cu"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val p = purchases.toDF().select(col("user_id").as("pu"),
        col("ts").as("purchase_ts"), col("value").as("amount"))
      .withWatermark("purchase_ts", "1 hour")
    val j2 = c.join(p, expr(
      """cu = pu AND purchase_ts >= click_ts AND
        |purchase_ts <= click_ts + interval 30 minutes""".stripMargin))
    val q = j2.writeStream.format("memory")
      .queryName("join_out").outputMode("append").start()
    try {
      clicks.addData(ev(1, "click", "2024-01-01 10:00:00"),
        ev(2, "click", "2024-01-01 10:00:00"))
      purchases.addData(
        ev(1, "purchase", "2024-01-01 10:10:00", 9.99), // within 30m -> joins
        ev(2, "purchase", "2024-01-01 11:30:00", 5.00)) // too late -> no join
      q.processAllAvailable()
      val rows = spark.table("join_out").collect()
      rows.length shouldBe 1
      rows.head.getAs[Long]("cu") shouldBe 1L
      rows.head.getAs[Double]("amount") shouldBe 9.99
    } finally q.stop()
  }
}
