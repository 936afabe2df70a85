package graft.streaming

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Warehouse-grade idempotent upsert sink for `foreachBatch` — the real
  * JDBC counterpart of [[UpsertSink]] and of the reference's transactional
  * batched `INSERT ... ON CONFLICT (review_id) DO UPDATE`
  * (postgres_sink.py:85-117, rollback at :110-117).
  *
  * Execution shape (the 100-TB-safe form):
  *  - rows are written EXECUTOR-SIDE, partition by partition — nothing is
  *    collected to the driver;
  *  - the batch is first reduced to one row per key and co-located by key
  *    (`dropDuplicates(key).repartition(key)`), so two partition writers
  *    can never race on the same primary key;
  *  - each partition runs one transaction: batched UPDATE of the
  *    conflict-updatable columns, then batched INSERT of the keys the
  *    UPDATE missed (the dialect-portable two-step upsert), COMMIT at the
  *    end, ROLLBACK + rethrow on any failure — Spark then retries the
  *    task, and retry-safety is exactly the keyed idempotence the upsert
  *    provides (at-least-once delivery + idempotent sink = effective
  *    exactly-once, SURVEY T1).
  *
  * Like the reference, a conflict updates only `updateCols` (there:
  * data_quality_score, processing_timestamp) — the original row's other
  * fields are preserved.
  *
  * @param url       JDBC url (tests: embedded Derby `jdbc:derby:memory:…`;
  *                  production: the warehouse endpoint — any driver on the
  *                  executor classpath that reports real update counts)
  * @param batchSize statements per executeBatch round-trip, matching the
  *                  reference's `batch_size=100` (postgres_sink.py:18)
  */
final class JdbcUpsertSink(
    url: String,
    table: String,
    keyCol: String,
    updateCols: Seq[String],
    batchSize: Int = 100) extends BatchSink {

  def write(df: DataFrame, batchId: Long): Unit = upsertBatch(df, batchId)

  def upsertBatch(df: DataFrame, batchId: Long): Unit = {
    val schema = df.schema
    df.dropDuplicates(keyCol).repartition(col(keyCol))
      .foreachPartition { rows: Iterator[Row] =>
        if (rows.hasNext) writePartition(rows, schema)
      }
  }

  private def writePartition(rows: Iterator[Row], schema: StructType): Unit = {
    val cols = schema.fieldNames.toSeq
    val keyIdx = schema.fieldIndex(keyCol)
    val updateIdx = updateCols.map(schema.fieldIndex)
    val updateSql = s"UPDATE $table SET " +
      updateCols.map(c => s"$c = ?").mkString(", ") + s" WHERE $keyCol = ?"
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (" +
      cols.map(_ => "?").mkString(", ") + ")"
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val upd = conn.prepareStatement(updateSql)
      val ins = conn.prepareStatement(insertSql)
      try {
        rows.grouped(batchSize).foreach { group =>
          group.foreach { r =>
            updateIdx.zipWithIndex.foreach { case (ci, pi) =>
              setParam(upd, pi + 1, r, ci, schema)
            }
            setParam(upd, updateCols.size + 1, r, keyIdx, schema)
            upd.addBatch()
          }
          val updated = upd.executeBatch()
          val missed = group.iterator.zip(updated.iterator)
            .collect { case (r, 0) => r }
          missed.foreach { r =>
            cols.indices.foreach(ci => setParam(ins, ci + 1, r, ci, schema))
            ins.addBatch()
          }
          ins.executeBatch()
        }
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally {
        upd.close(); ins.close()
      }
    } finally conn.close()
  }

  private def setParam(st: PreparedStatement, pos: Int, r: Row, ci: Int,
      schema: StructType): Unit = {
    val dt = schema(ci).dataType
    if (r.isNullAt(ci)) st.setNull(pos, jdbcType(dt))
    else dt match {
      case StringType => st.setString(pos, r.getString(ci))
      case DoubleType => st.setDouble(pos, r.getDouble(ci))
      case FloatType => st.setFloat(pos, r.getFloat(ci))
      case IntegerType => st.setInt(pos, r.getInt(ci))
      case LongType => st.setLong(pos, r.getLong(ci))
      case ShortType => st.setShort(pos, r.getShort(ci))
      case BooleanType => st.setBoolean(pos, r.getBoolean(ci))
      case TimestampType => st.setTimestamp(pos, r.getTimestamp(ci))
      case DateType => st.setDate(pos, r.getDate(ci))
      case _: DecimalType => st.setBigDecimal(pos, r.getDecimal(ci))
      case _ => st.setObject(pos, r.get(ci))
    }
  }

  private def jdbcType(dt: DataType): Int = dt match {
    case StringType => java.sql.Types.VARCHAR
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.FLOAT
    case IntegerType => java.sql.Types.INTEGER
    case LongType => java.sql.Types.BIGINT
    case ShortType => java.sql.Types.SMALLINT
    case BooleanType => java.sql.Types.BOOLEAN
    case TimestampType => java.sql.Types.TIMESTAMP
    case DateType => java.sql.Types.DATE
    case _: DecimalType => java.sql.Types.DECIMAL
    case _ => java.sql.Types.OTHER
  }
}
