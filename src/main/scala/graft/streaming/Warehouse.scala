package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Warehouse layout (SURVEY S12): the reference's Postgres table carries
  * secondary indexes on business_id, date DESC, quality DESC, rating
  * (init_db.sql:33-36). The Spark-land analog is physical layout, not
  * indexes: cluster by business_id (co-locates each business's reviews —
  * the reference's Kafka keying, made durable) and sort within partitions
  * by (business_id, date DESC) so min/max parquet footer stats prune both
  * business_id equality and date-range scans. At 100 TB this is the
  * difference between a full scan and touching a handful of row groups.
  */
object Warehouse {

  def write(cleaned: DataFrame, path: String,
            numPartitions: Option[Int] = None): Unit = {
    val parts = numPartitions.getOrElse(
      cleaned.sparkSession.sessionState.conf.numShufflePartitions)
    cleaned
      .repartition(parts, col("business_id"))
      .sortWithinPartitions(col("business_id"), col("date").desc)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Morton (Z-order) interleave of the low `bits` bits of two long
    * keys: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    * A pure constant-folded bit expression (codegen'd; no UDF).
    *
    * Why: a linear sort (a, b) clusters ONLY the leading key — a scan
    * filtered on `b` alone touches every file. The Z-value's locality is
    * two-dimensional, so range predicates on EITHER key map to a small
    * band of Z-space and min/max footer stats (plus file-level
    * clustering) prune both access paths — the multi-dimensional
    * generalization of S12's single-key sort-on-write, and the layout
    * trick (Delta/Iceberg OPTIMIZE ZORDER) that makes a 100 TB warehouse
    * answer both per-user and per-hour scans without two copies.
    */
  def zorder2(a: Column, b: Column, bits: Int = 10): Column =
    (0 until bits).flatMap { i =>
      Seq(
        shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)),
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)))
    }.reduce(_ + _)

  /** Z-order clustered write: range-partition + sort by the interleaved
    * key, so both dimensions cluster across AND within files.
    *
    * Both keys are min-max scaled to the full `bits` width FIRST — raw
    * interleaving of keys with unequal effective widths silently
    * degenerates to a sort on the wider key (a 4-bit user id against a
    * 10-bit hour index: every z-range split lands on hour bits and the
    * user dimension stops pruning — observed, and pinned in ZorderSpec).
    * Production engines normalize with sampled range-ids per column
    * (Delta OPTIMIZE ZORDER); min-max scaling is the deterministic
    * equivalent for monotone, roughly uniform keys, and costs one tiny
    * agg row broadcast onto the scan.
    */
  def zorderWrite(df: DataFrame, path: String, a: Column, b: Column,
      numPartitions: Int, bits: Int = 10): Unit = {
    val stats = df.agg(
      min(a).cast("double").as("_alo"), max(a).cast("double").as("_ahi"),
      min(b).cast("double").as("_blo"), max(b).cast("double").as("_bhi"))
    def scale(x: Column, lo: Column, hi: Column): Column =
      floor((x.cast("double") - lo) / (hi - lo + 1) * (1L << bits))
        .cast("long")
    df.crossJoin(broadcast(stats))
      .withColumn("_z", zorder2(
        scale(a, col("_alo"), col("_ahi")),
        scale(b, col("_blo"), col("_bhi")), bits))
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z", "_alo", "_ahi", "_blo", "_bhi")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
