package graft.streaming

import java.sql.{Connection, DriverManager, PreparedStatement, SQLException}

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
  *  - the batch is first reduced to one row per key (`dropDuplicates`),
  *    which both enforces last-writer-wins within the batch and makes
  *    same-key contention between partition writers impossible — one row
  *    per key in the whole batch means no further co-location shuffle;
  *  - each partition runs one transaction, COMMIT at the end, ROLLBACK +
  *    rethrow on failure — Spark retries the task, and retry-safety is
  *    exactly the keyed idempotence the upsert provides (at-least-once
  *    delivery + idempotent sink = effective exactly-once, SURVEY T1).
  *
  * Dialect handling:
  *  - **Postgres / DuckDB** (`jdbc:postgresql:`, `jdbc:duckdb:`): ONE
  *    atomic `INSERT ... ON CONFLICT (key) DO UPDATE SET c = EXCLUDED.c`
  *    statement per row, batched — the reference's exact concurrency
  *    contract (postgres_sink.py:105-112): safe under concurrent writers
  *    with no co-location precondition, because conflict resolution is
  *    row-atomic inside the database.
  *  - **everything else** (tests: embedded Derby): portable two-step —
  *    batched UPDATE of `updateCols`, then batched INSERT of the keys the
  *    UPDATE missed. Two hardening paths close the classic holes:
  *      1. drivers that return `Statement.SUCCESS_NO_INFO` (-2) from
  *         `executeBatch` (Oracle; MySQL with rewriteBatchedStatements)
  *         would make every row look updated and silently drop new keys —
  *         any negative count triggers a per-row `executeUpdate` re-probe
  *         (idempotent: re-running the UPDATE is harmless) for real miss
  *         detection;
  *      2. a concurrent writer inserting a key between our missed UPDATE
  *         and our INSERT raises a duplicate-key violation (SQLState 23xxx)
  *         — the transaction rolls back and the group retries ONCE per-row
  *         (update, insert on miss, update again on a lost insert race),
  *         so the two-step survives uncoordinated writers too, not just
  *         key-repartitioned ones.
  *
  * Like the reference, a conflict updates only `updateCols` (there:
  * data_quality_score, processing_timestamp) — the original row's other
  * fields are preserved.
  *
  * @param url       JDBC url (tests: embedded Derby `jdbc:derby:memory:…`;
  *                  production: the warehouse endpoint)
  * @param batchSize statements per executeBatch round-trip, matching the
  *                  reference's `batch_size=100` (postgres_sink.py:18)
  */
class JdbcUpsertSink(
    url: String,
    table: String,
    keyCol: String,
    updateCols: Seq[String],
    batchSize: Int = 100) extends BatchSink {

  /** Dialects with row-atomic `INSERT ... ON CONFLICT DO UPDATE`. */
  private val nativeUpsert: Boolean =
    url.startsWith("jdbc:postgresql") || url.startsWith("jdbc:duckdb")

  /** The native-dialect statement (postgres_sink.py:105-112 shape). */
  private[graft] def upsertSql(cols: Seq[String]): String =
    s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (" +
      cols.map(_ => "?").mkString(", ") + s") ON CONFLICT ($keyCol) " +
      "DO UPDATE SET " +
      updateCols.map(c => s"$c = EXCLUDED.$c").mkString(", ")

  def write(df: DataFrame, batchId: Long): Unit = upsertBatch(df, batchId)

  def upsertBatch(df: DataFrame, batchId: Long): Unit = {
    val schema = df.schema
    // dropDuplicates(key) leaves exactly one row per key in the WHOLE
    // batch, so no two partition writers can race on the same primary key
    // regardless of row placement — no extra co-location shuffle needed on
    // either dialect (the aggregation's own key shuffle already happened).
    val oneRowPerKey = df.dropDuplicates(keyCol)
    oneRowPerKey.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) writePartition(rows, schema)
    }
  }

  /** Test seam: wraps `executeBatch` so specs can simulate drivers that
    * report SUCCESS_NO_INFO instead of real update counts.
    */
  protected def updateBatchCounts(upd: PreparedStatement): Array[Int] =
    upd.executeBatch()

  /** Test seam: runs inside the race window of the two-step path (after
    * the UPDATE probe, before the INSERT of its misses) so specs can
    * inject a concurrent writer deterministically.
    */
  protected def raceWindowHook(): Unit = ()

  private def writePartition(rows: Iterator[Row], schema: StructType): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      if (nativeUpsert) writeNative(conn, rows, schema)
      else writeTwoStep(conn, rows, schema)
    } finally conn.close()
  }

  private def writeNative(conn: Connection, rows: Iterator[Row],
      schema: StructType): Unit = {
    val cols = schema.fieldNames.toSeq
    val ins = conn.prepareStatement(upsertSql(cols))
    try {
      rows.grouped(batchSize).foreach { group =>
        group.foreach { r =>
          cols.indices.foreach(ci => setParam(ins, ci + 1, r, ci, schema))
          ins.addBatch()
        }
        ins.executeBatch()
      }
      conn.commit()
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally ins.close()
  }

  // 23505 is the SQL-standard unique-violation state (Derby, Postgres,
  // DuckDB, H2). NOT a prefix match: other 23xxx states (e.g. 23502
  // NOT NULL) are data errors that must fail the task, not retry.
  private def isDuplicateKey(e: SQLException): Boolean =
    Option(e.getSQLState).contains("23505")

  private def writeTwoStep(conn: Connection, rows: Iterator[Row],
      schema: StructType): Unit = {
    val cols = schema.fieldNames.toSeq
    val keyIdx = schema.fieldIndex(keyCol)
    val updateIdx = updateCols.map(schema.fieldIndex)
    val updateSql = s"UPDATE $table SET " +
      updateCols.map(c => s"$c = ?").mkString(", ") + s" WHERE $keyCol = ?"
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (" +
      cols.map(_ => "?").mkString(", ") + ")"
    val upd = conn.prepareStatement(updateSql)
    val ins = conn.prepareStatement(insertSql)
    def bindUpdate(r: Row): Unit = {
      updateIdx.zipWithIndex.foreach { case (ci, pi) =>
        setParam(upd, pi + 1, r, ci, schema)
      }
      setParam(upd, updateCols.size + 1, r, keyIdx, schema)
    }
    def bindInsert(r: Row): Unit =
      cols.indices.foreach(ci => setParam(ins, ci + 1, r, ci, schema))
    // per-row upsert: the retry path after a lost insert race — by the
    // time it runs, the conflicting key exists, so UPDATE hits; a fresh
    // race on another key falls through insert -> update again
    def upsertRow(r: Row): Unit = {
      bindUpdate(r)
      if (upd.executeUpdate() == 0) {
        bindInsert(r)
        try ins.executeUpdate()
        catch {
          case e: SQLException if isDuplicateKey(e) =>
            // the key now exists, so this UPDATE must hit; anything else
            // means the conflict wasn't a row we can converge on
            bindUpdate(r)
            if (upd.executeUpdate() == 0) throw e
        }
      }
    }
    try {
      rows.grouped(batchSize).foreach { group =>
        try {
          group.foreach { r => bindUpdate(r); upd.addBatch() }
          val counts = updateBatchCounts(upd)
          // SUCCESS_NO_INFO (-2) means "updated rows unknown": trusting it
          // as "hit" silently drops new keys — re-probe per row instead
          val missed =
            if (counts.exists(_ < 0))
              group.filter { r => bindUpdate(r); upd.executeUpdate() == 0 }
            else group.iterator.zip(counts.iterator)
              .collect { case (r, 0) => r }.toSeq
          raceWindowHook()
          missed.foreach { r => bindInsert(r); ins.addBatch() }
          ins.executeBatch()
          conn.commit()
        } catch {
          case e: SQLException if isDuplicateKey(e) =>
            // lost an insert race to a concurrent writer: roll back the
            // group and redo it per-row (now every path is conflict-safe)
            conn.rollback()
            upd.clearBatch(); ins.clearBatch()
            group.foreach(upsertRow)
            conn.commit()
        }
      }
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally {
      upd.close(); ins.close()
    }
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
