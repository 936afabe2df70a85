package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch deduplication (SURVEY §2.4). The reference dedups on the composite
  * key (review_id, event_time) inside a 1-hour tumbling window
  * (`faust_app.py:77-80,113`); the batch-semantics analog over `events` is
  * "first event per (user_id, event_type, event-hour)".
  *
  * `dropDuplicates` keeps an ARBITRARY row per key — non-deterministic across
  * engines and across runs, so the oracle-checked variant uses a total order
  * (row_number over ts, event_id) instead: same result on every engine, and
  * the window shuffle partitions by the dedup key exactly like the
  * reference's Kafka keying. The streaming variant
  * (dropDuplicatesWithinWatermark) lives in graft.streaming.
  */
object Dedup {

  /** Keep the first event (by ts, then event_id) per
    * (user_id, event_type, hour(ts)).
    */
  def firstEventPerKey(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"), col("event_type"),
        date_trunc("hour", col("ts")))
      .orderBy(col("ts"), col("event_id"))
    events.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .orderBy("event_id")
  }

  /** The dropped-duplicate side (the reference emits a `duplicate` issue per
    * dropped record, faust_app.py:115-124).
    */
  def duplicateEvents(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"), col("event_type"),
        date_trunc("hour", col("ts")))
      .orderBy(col("ts"), col("event_id"))
    events.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") > 1)
      .drop("_rn")
      .orderBy("event_id")
  }
}
