package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._
import graft.oracle.Sql

/** Query registry backing SparkEntry.queries / SparkEntry.oracleSql.
  * Every entry returns a deterministic, oracle-comparable result: stable
  * column names/types and an explicit total ORDER BY mirrored in the SQL.
  */
object Queries {

  private def docsAnnotated(spark: SparkSession, dir: String): DataFrame =
    Clean.annotate(Reviews.docsAsReviews(Tables.load(spark, dir, "documents")))

  def cleanDocs(spark: SparkSession, dir: String): DataFrame =
    Clean.cleaned(docsAnnotated(spark, dir)).orderBy("review_id")

  def qualityIssues(spark: SparkSession, dir: String): DataFrame =
    Clean.issues(docsAnnotated(spark, dir))
      .orderBy("review_id", "issue_type", "field_name")

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_clean_docs" -> (cleanDocs _),
    "q_quality_issues" -> (qualityIssues _)
  )

  val oracles: Map[String, String] = Map(
    "q_clean_docs" -> Sql.cleanDocs,
    "q_quality_issues" -> Sql.qualityIssues
  )
}
