package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed / grouped statistics.
  *
  * `hourlyStats` implements the reference's FULL declared aggregate schema
  * (`streaming/models.py:101-127` ReviewStats — rating histogram, spam and
  * wrong-language counts, avg word/sentence counts) — the Faust app only
  * ever wires the 4-key dict at `faust_app.py:85-90`; SURVEY §2.5 A3 decides
  * we implement the declared capability in full. Grouping key = event-time
  * hour (`faust_app.py:177` truncates minute/second -> `date_trunc("hour")`).
  *
  * Scale notes: a single hash aggregation — Catalyst plans partial (map-side)
  * + final aggregation, so the shuffle carries one row per (hour) group per
  * partition, not the data. Averages are rounded to 2dp so parallel
  * summation order cannot leak into compared output.
  */
object Stats {

  /** Per-hour ReviewStats over the ANNOTATED stream (accepted + rejected).
    * Accepted-only metrics (`avg_*`, rating histogram) aggregate the cleaned
    * sub-stream exactly like the Faust stats agent that consumes
    * `cleaned_reviews` (faust_app.py:173-189); total/rejected/spam/language
    * counts need the full stream.
    */
  def hourlyStats(annotated: DataFrame): DataFrame = {
    val acc = col("accepted")
    def countIf(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    def avgIf(c: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
      round(avg(when(c, v)), 2)
    val ratingHist = (1 to 5).map(k =>
      countIf(acc && col("rating") === k).as(s"rating_$k"))
    val aggs = Seq(
      countIf(acc).as("valid_reviews"),
      countIf(!acc).as("rejected_reviews"),
      avgIf(acc, col("data_quality_score")).as("avg_quality_score"),
      countIf(col("stage") === "spam_detected").as("spam_count"),
      countIf(col("stage") === "unsupported_language")
        .as("wrong_language_count")) ++ ratingHist ++ Seq(
      avgIf(acc, col("rating")).as("avg_rating"),
      avgIf(acc, col("word_count")).as("avg_word_count"),
      avgIf(acc, col("sentence_count")).as("avg_sentence_count"))
    annotated
      .groupBy(date_trunc("hour", col("date")).as("window_start"))
      .agg(count(lit(1)).as("total_reviews"), aggs: _*)
      .orderBy("window_start")
  }

  /** Issue-type histogram (`test_quality.py:46-54` + SURVEY A4/O2), sorted
    * desc by count with a deterministic tiebreak.
    */
  def issueHistogram(issues: DataFrame): DataFrame =
    issues.groupBy("issue_type").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("issue_type"))

  /** Per-business stats mirroring the warehouse's business_id index read
    * pattern (init_db.sql:33).
    */
  def businessStats(cleaned: DataFrame): DataFrame =
    cleaned.groupBy("business_id").agg(
      count(lit(1)).as("n_reviews"),
      round(avg(col("rating")), 2).as("avg_rating"),
      round(avg(col("data_quality_score")), 2).as("avg_quality"),
      min(col("data_quality_score")).as("min_quality"),
      max(col("data_quality_score")).as("max_quality"))
      .orderBy("business_id")
}
