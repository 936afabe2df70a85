package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hopping (sliding) event-time windows — the overlap generalization of
  * the reference's tumbling hourly tables (`faust_app.py:83-91` tumbles;
  * Faust's `.hopping()` is the sibling API the reference leaves unwired).
  *
  * Scale shape: Spark's native `window(ts, size, slide)` is a bounded
  * per-row generator — each event expands to exactly size/slide = 2
  * window rows MAP-SIDE, before one partial-agg groupBy, so the overlap
  * factor multiplies in-partition compute, never shuffle fan-out beyond
  * the 2x row count. The distinct-user count rides the same exchange
  * (Expand-based two-phase distinct agg).
  */
object TimeWindows {

  /** Window length / hop. 60/30 → every event in exactly 2 windows. */
  val HopSizeMinutes = 60
  val HopSlideMinutes = 30

  /** Per (window_start, event_type): event count, distinct users, exact
    * cents-quantized value sum (see Relational.qsum for why plain double
    * sums cannot cross the oracle boundary).
    */
  def hopping(events: DataFrame): DataFrame =
    events
      .groupBy(
        window(col("ts"), s"$HopSizeMinutes minutes",
          s"$HopSlideMinutes minutes").as("_w"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(Relational.qsum(col("value"), 100), 2).as("total_value"))
      .select(col("_w.start").as("window_start"), col("event_type"),
        col("n_events"), col("n_users"), col("total_value"))
      .orderBy("window_start", "event_type")
}
