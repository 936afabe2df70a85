package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, Row}

/** Idempotent keyed upsert sink for foreachBatch — the engine-side analog of
  * the reference's `INSERT ... ON CONFLICT (review_id) DO UPDATE`
  * (postgres_sink.py:85-117): at-least-once delivery + keyed idempotence =
  * effective exactly-once (SURVEY T1). The store here is an in-JVM map (the
  * tests' "warehouse"); a JDBC variant is the same collect-free pattern with
  * `df.foreachPartition` + batched PreparedStatement upserts.
  *
  * NOTE collect() is acceptable ONLY because micro-batches are sink-bounded
  * (100 rows/10 s in the reference); the partition-wise path below
  * (`upsertPartitions`) is the 100-TB-safe form.
  */
final class UpsertSink(keyCol: String) extends Serializable {
  val store = new ConcurrentHashMap[String, Row]()

  def upsertBatch(df: DataFrame, batchId: Long): Unit = {
    val keyIdx = df.schema.fieldIndex(keyCol)
    df.collect().foreach(r => store.put(r.getString(keyIdx), r))
  }

  /** Distributed form: upsert executor-side, partition by partition (no
    * driver materialization). The local map only works single-JVM; on a
    * cluster the same closure holds a JDBC connection per partition.
    */
  def upsertPartitions(df: DataFrame, batchId: Long): Unit = {
    val keyIdx = df.schema.fieldIndex(keyCol)
    val s = store
    df.foreachPartition { rows: Iterator[Row] =>
      rows.foreach(r => s.put(r.getString(keyIdx), r))
    }
  }

  def size: Int = store.size()
}
