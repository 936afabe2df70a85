package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Cohort

/** Weekly cohort retention: exact matrix on a crafted two-cohort fixture
  * (Monday week anchoring, offset arithmetic, the diagonal ≡ 1.0, and
  * multi-event weeks counting a user once).
  */
class CohortSpec extends AnyFunSuite with Matchers with TestSpark {

  // 2024-01-01 is a Monday — week buckets align on it exactly
  private def ts(day: Int, hour: Int = 12): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("two cohorts retain exactly as constructed") {
    import spark.implicits._
    // cohort W0 (week of Jan 1): users 1, 2, 3
    //   W0: all three active; W1: users 1, 2; W2: user 1 (twice — still 1)
    // cohort W1 (week of Jan 8): user 4; active W1 only
    val rows = Seq(
      (1L, ts(1)), (2L, ts(2)), (3L, ts(3)),
      (1L, ts(8)), (2L, ts(9)),
      (1L, ts(15)), (1L, ts(16)),
      (4L, ts(10)))
    val df = rows.zipWithIndex
      .map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "ts")
    val out = Cohort.retention(df).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val w0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val w1 = Timestamp.valueOf("2024-01-08 00:00:00")
    out((w0, 0)) shouldBe ((3L, 3L, 1.0))
    out((w0, 1)) shouldBe ((2L, 3L, 0.6667))
    out((w0, 2)) shouldBe ((1L, 3L, 0.3333))
    out((w1, 0)) shouldBe ((1L, 1L, 1.0))
    out.size shouldBe 4
  }
}
