package graft.streaming

import org.apache.spark.sql.DataFrame

/** A micro-batch sink for `foreachBatch` — the engine's produce-side
  * contract. The reference has two produce paths per consumed record
  * (faust_app.py:156-170: cleaned -> topic+Postgres, issues -> topic); here
  * each path is a [[BatchSink]] so the [[Pipeline]] topology composes any
  * warehouse ([[JdbcUpsertSink]]), test double ([[UpsertSink]]) or
  * append-stream sink ([[ParquetSink]]) without changing the wiring.
  *
  * Contract: `write` runs on the DRIVER once per micro-batch but must not
  * materialize rows driver-side — implementations write executor-side
  * (`foreachPartition`, a distributed `df.write`, …). Delivery is
  * at-least-once (Spark may replay a batch after failure); sinks are either
  * keyed-idempotent (upserts — effective exactly-once, SURVEY T1) or
  * declared append-only at-least-once like the reference's Kafka produces.
  */
trait BatchSink extends Serializable {
  def write(df: DataFrame, batchId: Long): Unit
}

/** Distributed append sink: each micro-batch is written executor-side as
  * parquet part-files under `dir`. This is the engine-side analog of the
  * reference's produce to the `quality_issues` topic (faust_app.py:168-170)
  * — an unkeyed at-least-once event stream (a replayed batch appends again,
  * exactly like a re-produced Kafka message; downstream consumers dedup on
  * content if they need exactly-once, as they must with the reference too).
  * Nothing touches the driver, so the issue fork scales with executors —
  * the fix for the round-2 driver-queue anti-pattern.
  *
  * @param maxFiles when > 0, coalesce each batch to at most this many
  *                 part-files — micro-batch issue streams are small, and 32
  *                 tiny files per 10-second batch is the classic small-file
  *                 problem for whoever compacts the warehouse later
  */
final class ParquetSink(dir: String, maxFiles: Int = 0) extends BatchSink {
  def write(df: DataFrame, batchId: Long): Unit = {
    val out = if (maxFiles > 0) df.coalesce(maxFiles) else df
    out.write.mode("append").parquet(dir)
  }
}
