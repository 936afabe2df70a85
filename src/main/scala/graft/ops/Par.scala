package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for per-row-heavy operators (regex token
  * splits, gram explodes): a corpus that arrives in fewer partitions
  * than the session's parallelism — one small parquet file at test
  * scale — serializes every downstream map stage through a handful of
  * cores, and the cost is invisible in the plan (no exchange, just a
  * starved scan). On a real cluster the source layout provides the
  * partitions and this is a NO-OP: the condition inspects the planned
  * input, so the round-robin exchange exists only for degenerate
  * inputs and never shows up at scale.
  */
object Par {
  def fanOut(df: DataFrame): DataFrame = {
    // streaming frames can't be planned eagerly (.rdd) and micro-batches
    // bring their own partitioning — the guard is batch-only
    if (df.isStreaming) return df
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions >= n) return df
    // DETERMINISTIC spread (hash partitioning), not round-robin:
    // round-robin placement is order-dependent, which marks the exchange
    // non-reusable — a downstream self-join would then execute the whole
    // upstream chain once per branch instead of reusing one stage.
    // Hash the LEADING column only: every guarded frame leads with its
    // row key (doc_id / review_id / l_orderkey), and hashing the full
    // row would re-hash the text payload on every guarded scan
    df.repartition(n, org.apache.spark.sql.functions.col(df.columns.head))
  }
}
