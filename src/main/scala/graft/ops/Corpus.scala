package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic corpora for the dedup/similarity operators. The driver's
  * `documents` table has no duplicates, so — exactly like graft.ops.Reviews
  * derives dirty reviews — we derive corpora with KNOWN duplicate structure
  * from `doc_id` arithmetic. The identical construction lives in the DuckDB
  * oracle (graft.oracle.SqlText.*Cte), so both engines see the same rows.
  */
object Corpus {

  /** documents + EXACT duplicates: every doc_id % 11 == 0 is repeated
    * verbatim under doc_id + 100000.
    */
  def withExactDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "source")
    docs.unionAll(
      docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"),
          col("source")))
  }

  /** documents + NEAR duplicates: every doc_id % 13 == 0 is repeated under
    * doc_id + 100000 with its last word removed.
    */
  def withNearDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "source")
    docs.unionAll(
      docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          regexp_replace(col("text"), """\s+\S+\s*$""", "").as("text"),
          col("source")))
  }
}
