package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Relational

/** Time-RANGE frame semantics: interval edges inclusive, timestamp peers
  * share a frame, and the quantized frame sum is order-independent.
  */
class RollingSpendSpec extends AnyFunSuite with Matchers with TestSpark {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("trailing-hour frame: inclusive edge, peers, per-user isolation") {
    import spark.implicits._
    val ev = Seq(
      // user 1: purchases at 10:00, 10:30, 11:00 (exactly 1h after the
      // first — inclusive), plus a peer at 10:30
      (1L, ts(0), 1L, "purchase", 10.0),
      (2L, ts(30), 1L, "purchase", 5.0),
      (3L, ts(30), 1L, "purchase", 7.0),
      (4L, Timestamp.valueOf("2024-01-01 11:00:00"), 1L, "purchase", 1.0),
      // outside any frame: a click, and another user
      (5L, ts(30), 1L, "click", 99.0),
      (6L, ts(45), 2L, "purchase", 3.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Relational.rollingSpend(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    out(1L) shouldBe (1L, 10.0)
    // peers at 10:30 see each other regardless of event_id order
    out(2L) shouldBe (3L, 22.0)
    out(3L) shouldBe (3L, 22.0)
    // 11:00 frame = [10:00, 11:00] inclusive -> all four purchases
    out(4L) shouldBe (4L, 23.0)
    out(6L) shouldBe (1L, 3.0)
    out.contains(5L) shouldBe false
  }

  test("sf corpus: frame counts match a naive per-row recomputation") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val got = Relational.rollingSpend(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    p.foreach { case (id, u, us, _) =>
      val frame = p.filter(q => q._2 == u && q._3 <= us &&
        q._3 >= us - 3600000000L)
      val want = (frame.length.toLong,
        frame.map(q => math.floor(q._4 * 100 + 0.5).toLong).sum / 100.0)
      withClue(s"event $id: ") { got(id) shouldBe want }
    }
    got.size shouldBe p.length
  }
}
