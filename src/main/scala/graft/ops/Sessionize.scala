package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization over the `events` stream table: consecutive
  * events of a user belong to one session while the gap between them stays
  * under [[GapMinutes]]; a gap >= the threshold starts a new session.
  *
  * Spark-first: the built-in `session_window(ts, gap)` grouping — the SAME
  * expression sessionizes an unbounded `readStream` with watermark-based
  * state eviction (SURVEY §2.9 / Structured Streaming's native session
  * support), so the batch query here is also the streaming topology's
  * session operator. Semantics: session windows merge INCLUSIVELY at the
  * end boundary — an event at exactly `prev_ts + gap` extends the session;
  * only a STRICTLY larger gap starts a new one (pinned in SessionizeSpec
  * and mirrored in the oracle's lag formulation).
  *
  * Scale shape: ONE shuffle on user_id (session assembly is per-key local
  * sorting inside the exchange — no per-event window pass over a global
  * sort), then per-session hash aggregation. Sessions of one user land on
  * one task, which is the correct unit: user event counts are bounded;
  * there is no cross-user state.
  *
  * total_value follows the repo-wide money contract (round 2dp after a
  * full-precision sum, mirrored in the oracle); duration is an exact
  * integer microsecond difference scaled to seconds.
  */
object Sessionize {

  val GapMinutes = 30

  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$GapMinutes minutes").as("_w"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("n_clicks"),
        round(sum(col("value")), 2).as("total_value"))
      .withColumn("duration_sec",
        (unix_micros(col("session_end")) - unix_micros(col("session_start")))
          / lit(1000000.0))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("n_clicks"), col("total_value"),
        col("duration_sec"))
      .orderBy("user_id", "session_start")
}
