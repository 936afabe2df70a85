package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus snapshot diffing — the audit primitive of an incremental
  * curation service: which documents were added, removed, or changed
  * between yesterday's corpus and today's? Downstream consumers key off
  * this to re-run dedup/index/decontamination on the delta only (see
  * [[graft.IndexStore.mergeOrBuild]] for the index side of the same
  * contract).
  */
object Snapshot {

  /** Content-hash full-outer diff: (doc_id, old_hash, new_hash, status)
    * for every doc whose membership or content differs between the two
    * snapshots; unchanged docs are dropped (the overwhelming majority at
    * scale — the output is ∝ the churn, not the corpus).
    *
    * Scale shape: both sides reduce to (doc_id, md5) BEFORE the join —
    * text never shuffles — and the full-outer join key-partitions on
    * doc_id (on a bucketed-by-doc_id warehouse layout, Z-ordered or
    * CLUSTERed on the id as [[graft.streaming.Warehouse]] lays out, the
    * exchange disappears entirely). No broadcast: both sides are
    * corpus-sized by assumption.
    */
  def corpusDiff(old: DataFrame, neu: DataFrame): DataFrame = {
    val oh = old.select(col("doc_id"), md5(col("text")).as("old_hash"))
    val nh = neu.select(col("doc_id"), md5(col("text")).as("new_hash"))
    oh.join(nh, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") =!= col("new_hash"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("doc_id"), col("old_hash"), col("new_hash"),
        col("status"))
      .orderBy("doc_id")
  }

  /** Id base for the synthetic snapshot's added docs — far above every
    * other derived-corpus base (+100000 near-dups, +200000 excerpts) so
    * the bases never collide even at large MakeSf factors.
    */
  val AddBase = 1000000L

  /** The deterministic "today" snapshot the diff queries run against:
    * every doc_id % 23 == 0 is DELETED, every surviving doc_id % 17 == 0
    * is REVISED (trailing marker appended), and every doc_id % 19 == 0
    * re-appears as a fresh document under doc_id + [[AddBase]]. Mirrored
    * verbatim in the oracle (graft.oracle.SqlText.corpusDiff).
    */
  def newSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "source")
    docs.filter(col("doc_id") % 23 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 17 === 0, concat(col("text"), lit(" revised")))
          .otherwise(col("text")))
      .unionAll(
        docs.filter(col("doc_id") % 19 === 0)
          .select((col("doc_id") + AddBase).as("doc_id"),
            concat(lit("fresh "), col("text")).as("text"),
            col("source")))
  }
}
