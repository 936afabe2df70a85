package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, Row}

/** Idempotent keyed upsert sink for foreachBatch — the engine-side analog of
  * the reference's `INSERT ... ON CONFLICT (review_id) DO UPDATE`
  * (postgres_sink.py:85-117): at-least-once delivery + keyed idempotence =
  * effective exactly-once (SURVEY T1). The store here is an in-JVM map (the
  * tests' "warehouse"); the JDBC counterpart with the same [[BatchSink]]
  * face is [[JdbcUpsertSink]].
  *
  * `write` goes through the partition-wise executor-side path — the same
  * 100-TB-safe shape as the JDBC sink. Tasks reach the store through a
  * per-JVM registry keyed by sink id (closure-capturing the map itself
  * would hand each task a serialized COPY): in local mode driver and
  * executors share the JVM so the double observes every write; on a real
  * cluster this double is meaningless by design — use [[JdbcUpsertSink]].
  */
final class UpsertSink(keyCol: String) extends BatchSink {
  private val id = java.util.UUID.randomUUID().toString

  def store: ConcurrentHashMap[String, Row] = UpsertSink.storeFor(id)

  def write(df: DataFrame, batchId: Long): Unit = upsertPartitions(df, batchId)

  /** Distributed form: upsert executor-side, partition by partition (no
    * driver materialization) — on a cluster the same closure shape holds a
    * JDBC connection per partition instead of the registry lookup.
    */
  def upsertPartitions(df: DataFrame, batchId: Long): Unit = {
    val keyIdx = df.schema.fieldIndex(keyCol)
    val sinkId = id
    df.foreachPartition { rows: Iterator[Row] =>
      val s = UpsertSink.storeFor(sinkId)
      rows.foreach(r => s.put(r.getString(keyIdx), r))
    }
  }

  def size: Int = store.size()
}

object UpsertSink {
  private val stores =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, Row]]()

  private def storeFor(id: String): ConcurrentHashMap[String, Row] =
    stores.computeIfAbsent(id, _ => new ConcurrentHashMap[String, Row]())
}
