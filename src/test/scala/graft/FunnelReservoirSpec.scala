package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.ops.{Relational, Sampling}

/** Forward conversion funnel boundary semantics + deterministic
  * hash-ranked reservoir sampling.
  */
class FunnelReservoirSpec extends AnyFunSuite with Matchers with TestSpark {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def eventsOf(rows: (Long, Long, Timestamp, String, Double)*) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  test("funnel: within-hour converts, exact +1h converts, same-ts and " +
      "late purchases do not") {
    val out = Relational.funnelOf(eventsOf(
      // user 1: click->purchase in 30 min (converts); second click sees
      // no later purchase
      (1L, 1L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (2L, 1L, ts("2024-01-01 10:30:00"), "purchase", 5.0),
      (3L, 1L, ts("2024-01-01 10:40:00"), "click", 0.0),
      // user 2: purchase 90 min later — outside the window
      (4L, 2L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (5L, 2L, ts("2024-01-01 11:30:00"), "purchase", 5.0),
      // user 3: purchase at exactly +1h — inclusive boundary converts
      (6L, 3L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (7L, 3L, ts("2024-01-01 11:00:00"), "purchase", 5.0),
      // user 4: purchase at the SAME timestamp — strictly-after misses
      (8L, 4L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (9L, 4L, ts("2024-01-01 10:00:00"), "purchase", 5.0)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out shouldBe Array(
      (1L, 2L, 1L), (2L, 1L, 0L), (3L, 1L, 1L), (4L, 1L, 0L))
  }

  test("reservoir: k per source, equal to the window-rank reference, " +
      "stable under repartitioning") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val got = Sampling.reservoir(docs).collect()
    got.groupBy(_.getString(0)).values
      .foreach(_.length should be <= Sampling.ReservoirK)

    import org.apache.spark.sql.expressions.Window
    val ref = docs.select(col("source"), col("doc_id"),
        conv(substring(md5(concat(lit(Sampling.ReservoirSalt),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
          .as("draw"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy("draw", "doc_id")))
      .filter(col("rn") <= Sampling.ReservoirK)
      .select("source", "doc_id", "draw")
      .orderBy("source", "draw", "doc_id")
      .collect()
    got shouldBe ref

    Sampling.reservoir(docs.repartition(13)).collect() shouldBe got
  }
}
