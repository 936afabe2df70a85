package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Clean

/** The reference's complete topology, wired end-to-end (SURVEY §3):
  *
  *   E1 producer:   JSONL replay -> RawYelpReview stream
  *   E2 processor:  dedup (tagged, 2h TTL watermark state) ->
  *                  quality annotate -> fork: cleaned / quality_issues
  *   E3 sink:       micro-batch idempotent keyed upsert ("warehouse")
  *   stats agent:   event-time hourly aggregation (update mode)
  *
  * One streaming query does E2+E3 through foreachBatch (single pass over
  * each micro-batch, two sinks — the reference's one-consume-two-produces);
  * a second query maintains the stats table, decoupled exactly like the
  * reference's second Faust agent consuming `cleaned_reviews`.
  *
  * Both produce paths are [[BatchSink]]s, so the same topology runs against
  * the in-memory test double ([[UpsertSink]]), the real warehouse
  * ([[JdbcUpsertSink]]) and a distributed issue stream ([[ParquetSink]]) —
  * nothing is collected to the driver anywhere in the streaming path.
  *
  * Dedup uses [[Streams.dedupTagged]] (duplicates marked, not dropped), so
  * every dedup-dropped record emits a `duplicate` issue into the SAME issue
  * sink as the quality issues — the reference's per-duplicate emission
  * (faust_app.py:113-124), previously only available as a batch diff.
  */
final class Pipeline(
    cleanedSink: BatchSink,
    issueSink: BatchSink,
    dedupDelay: String = "2 hours") {

  /** Start E2+E3 over a raw-review stream; returns the streaming query. */
  def start(raw: DataFrame, checkpoint: String): StreamingQuery = {
    val tagged = Streams.dedupTagged(raw, dedupDelay)
    tagged.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // persist the NARROW tagged batch (10 cols + flag) so the stateful
        // dedup op runs exactly once; the wide annotate output is persisted
        // by routeBatch for the two issue/cleaned branches. (Measured: this
        // beats caching only the wide annotated frame — building the
        // columnar cache for struct/array-heavy rows costs more than the
        // extra codegen'd annotate pass it saves.)
        batch.persist()
        try {
          val fresh = batch.filter(!col("_dup")).drop("_dup")
          val dupIssues = Pipeline.taggedDuplicateIssues(batch)
          Streams.routeBatch(Clean.annotate(fresh))(
            cleaned => cleanedSink.write(cleaned, id),
            issues => issueSink.write(issues.unionByName(dupIssues), id))
        } finally batch.unpersist()
      }
      .start()
  }
}

object Pipeline {
  private def issueShape(keyed: DataFrame): DataFrame =
    keyed.select(col("review_id"),
      lit("duplicate").as("issue_type"),
      lit("review_id").as("field_name"),
      concat(col("review_id"), lit(":"), col("date").cast("string"))
        .as("og_value"),
      lit(null).cast("string").as("expected_range"),
      lit(graft.rules.Rules.SevDuplicate).as("severity"))

  /** `duplicate` issues for the rows [[Streams.dedupTagged]] marked — the
    * streaming-path form (faust_app.py:115-124), same schema as
    * [[graft.ops.Clean.issues]] so the two fan into one sink.
    */
  def taggedDuplicateIssues(tagged: DataFrame): DataFrame =
    issueShape(tagged.filter(col("_dup")))

  /** Dedup-dropped records as `duplicate` issues — the batch-side diff
    * variant, for batch jobs that deduped with a plain dropDuplicates and
    * kept both frames.
    */
  def duplicateIssues(batch: DataFrame, deduped: DataFrame): DataFrame =
    issueShape(batch.select("review_id", "date")
      .exceptAll(deduped.select("review_id", "date")))
}
