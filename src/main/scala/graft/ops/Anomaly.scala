package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Volume-anomaly detection over the event stream — the batch face of the
  * monitoring rule an operations pipeline alarms on (reference analog: the
  * hourly stats table `faust_app.py:173-189` is what a human eyeballs for
  * spikes; this operator scores the spike). Per (event_type, hour) counts
  * are z-scored against that event_type's own hourly distribution and
  * flagged when |z| > [[ZThreshold]].
  *
  * Exact-arithmetic contract: with n hours, s1 = Σcnt, s2 = Σcnt² (all
  * integer sums), the population z-score algebra collapses to
  * z = (n·cnt − s1) / sqrt(n·s2 − s1²) — integer numerator, ONE
  * correctly-rounded sqrt and ONE division, so Spark and the DuckDB
  * oracle produce bit-identical doubles (same policy as bm25's rational
  * idf / dsir's single division). Zero-variance types guard to z = 0.
  *
  * Scale shape: two partial-agg groupBys (hour counts, then per-type
  * moments — map-side combined, never a window over an unbounded
  * partition), and the per-type moment frame is |event_type| rows —
  * broadcast back onto the hourly counts. At 100 TB the hourly-count
  * frame is ~n_types × n_hours rows (tiny), the scan is the only big
  * stage, and nothing shuffles the raw events twice.
  */
object Anomaly {

  val ZThreshold = 2.0

  /** Per-(event_type, hour) counts — the shared first stage. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))

  /** Per-type integer moment sums (n, Σcnt, Σcnt²) over hourly counts —
    * the tiny "trained" reference frame; broadcastable at any scale and
    * the static side of the streaming alert join
    * ([[graft.streaming.Streams.anomalyAlerts]]).
    */
  def moments(events: DataFrame): DataFrame =
    hourlyCounts(events).groupBy(col("event_type")).agg(
      count(lit(1)).as("_n"),
      sum(col("n_events")).as("_s1"),
      // Σcnt² and the n·s2 − s1² discriminant as DECIMAL(38,0): hourly
      // counts ~1e9 over years of hours would silently overflow Long
      // (cnt² alone is ~1e18); decimal keeps the moment algebra exact at
      // any scale, and at non-overflowing scale the values — hence the
      // doubles they cast to — are bit-identical to the integer form
      // (DuckDB's sum(BIGINT) is already HUGEINT on the oracle side)
      sum((col("n_events").cast("decimal(19,0)") * col("n_events"))
        .cast("decimal(38,0)")).as("_s2"))

  /** z = (n·cnt − s1) / sqrt(n·s2 − s1²), 0 when variance is zero. */
  def zScore(cnt: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val num = (col("_n") * cnt - col("_s1")).cast("double")
    val den = sqrt((col("_n").cast("decimal(38,0)") * col("_s2") -
        (col("_s1").cast("decimal(19,0)") * col("_s1")).cast("decimal(38,0)"))
      .cast("double"))
    when(den > 0, num / den).otherwise(lit(0.0))
  }

  def hourlyAnomaly(events: DataFrame): DataFrame = {
    val z = zScore(col("n_events"))
    hourlyCounts(events).join(broadcast(moments(events)), "event_type")
      .select(col("event_type"), col("hour"),
        col("n_events").cast("long").as("n_events"),
        round(z, 4).as("z_score"),
        (z > ZThreshold || z < -ZThreshold).as("is_anomaly"))
      .orderBy("event_type", "hour")
  }
}
