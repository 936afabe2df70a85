package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.AsOfJoin

/** As-of join semantics on hand-built timelines: latest prior right row
  * per key, equal-ts matches, inner drops unmatched, one window pass.
  */
class AsOfJoinSpec extends AnyFunSuite with Matchers with TestSpark {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks the latest right row at or before each left ts, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "L1"),
      (1L, ts("2024-01-01 12:00:00"), "L2"),
      (2L, ts("2024-01-01 09:00:00"), "L3"), // before any right -> dropped
      (2L, ts("2024-01-01 11:00:00"), "L4"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 10:00:00"), 20.0), // equal ts -> matches L1
      (1L, ts("2024-01-01 11:59:00"), 30.0),
      (2L, ts("2024-01-01 10:30:00"), 40.0))
      .toDF("user_id", "ts", "pv")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("pv"))
      .select("tag", "pv").collect().map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    out shouldBe Map("L1" -> 20.0, "L2" -> 30.0, "L4" -> 40.0)
  }

  test("left-outer variant keeps unmatched left rows with null payload") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 08:00:00"), "early")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("user_id", "ts", "pv")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("pv"),
      inner = false).select("tag", "pv").collect()
    out.length shouldBe 1
    out.head.isNullAt(1) shouldBe true
  }

  test("a matched right row with NULL payload wins over older non-nulls") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "L")).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(10.0)),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[Double])) // most recent
      .toDF("user_id", "ts", "pv")
    // ASOF matches on right-ROW existence (DuckDB semantics): the 11:00 row
    // matches and contributes its NULL — the 10:00 value must not leak
    // through, and the row must not be dropped by the inner filter
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("pv")).collect()
    out.length shouldBe 1
    assert(out.head.isNullAt(out.head.fieldIndex("pv")))
    // left-outer distinguishes matched-with-null from unmatched
    val outer = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("pv"),
      inner = false).collect()
    outer.head.getAs[Boolean]("_matched") shouldBe true
  }

  test("plans one shuffle (window) — no cross/range join blowup") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions.col
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("pv"))
    val plan = AsOfJoin.asOf(clicks, purchases, "user_id", "ts", Seq("pv"))
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should include("Window")
  }
}
