package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Input-parallelism guard for per-row-heavy operators (regex token
  * splits, gram explodes): a corpus that arrives in fewer partitions
  * than the session's parallelism — one small parquet file at test
  * scale — serializes every downstream map stage through a handful of
  * cores, and the cost is invisible in the plan (no exchange, just a
  * starved scan). On a real cluster the source layout provides the
  * partitions and this is a NO-OP: the condition inspects the planned
  * input, so the guard exchange exists only for degenerate inputs and
  * never shows up at scale.
  */
object Par {

  /** Spread `df` over the session's parallelism when its input layout is
    * degenerate. `key` is the hash-spread column and MUST be
    * high-cardinality (the row key) — hashing a low-cardinality column
    * (source, lang) would collapse the fan-out into a few skewed
    * partitions, the exact starvation the guard exists to fix. The
    * default is the frame's LEADING column because every guarded table
    * frame leads with its row key (doc_id / review_id / l_orderkey);
    * call sites that reorder projections before guarding must pass the
    * key explicitly.
    */
  def fanOut(df: DataFrame, key: String = null): DataFrame = {
    // streaming frames can't be planned eagerly and micro-batches bring
    // their own partitioning — the guard is batch-only
    if (df.isStreaming) return df
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (inputPartitions(df) >= n) return df
    // DETERMINISTIC spread (hash partitioning), not round-robin:
    // round-robin placement is order-dependent, which marks the exchange
    // non-reusable — a downstream self-join would then execute the whole
    // upstream chain once per branch instead of reusing one stage.
    val k = if (key == null) df.columns.head else key
    df.repartition(n, org.apache.spark.sql.functions.col(k))
  }

  /** Scan parallelism of `df`'s input WITHOUT forcing physical planning.
    * When every leaf is a file relation, mirror Spark's own
    * FilePartition split math over the (already listed and cached) file
    * index — free on the driver. Anything else (local relations in
    * tests, views over non-file sources) falls back to planning via
    * `df.rdd`, which those small frames can afford.
    */
  private def inputPartitions(df: DataFrame): Long = {
    val leaves = df.queryExecution.analyzed.collectLeaves()
    val fsRels = leaves.collect {
      case l: LogicalRelation => l.relation match {
        case r: HadoopFsRelation => r
      }
    }
    if (fsRels.size != leaves.size) return df.rdd.getNumPartitions.toLong
    val conf = df.sparkSession.sessionState.conf
    val openCost = conf.filesOpenCostInBytes
    var bytes = 0L
    fsRels.foreach { r =>
      r.location.listFiles(Nil, Nil).foreach { pd =>
        pd.files.foreach { f => bytes += f.getLen + openCost }
      }
    }
    // FilePartition.maxSplitBytes: files split at
    // min(maxPartitionBytes, max(openCost, totalBytes/parallelism))
    val parallelism = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    val maxSplit = math.max(1L, math.min(conf.filesMaxPartitionBytes,
      math.max(openCost, bytes / parallelism)))
    (bytes + maxSplit - 1) / maxSplit
  }
}
