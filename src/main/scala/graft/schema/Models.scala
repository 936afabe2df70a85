package graft.schema

import java.sql.Timestamp

/** Typed record schemas mirroring the reference's pydantic models
  * (`streaming/models.py:22-127`) — the Dataset[T] surface of the engine.
  * DataFrames remain the engine core (SURVEY §1); these case classes give
  * type safety at the API boundary and drive the streaming tests' encoders.
  */
final case class RawReview(
    review_id: String,
    business_id: String,
    user_id: String,
    rating: Option[Double], // models.py:30 float; 0 counts as missing (quirk)
    text: String,
    date: Timestamp, // event time, models.py:32
    useful: Option[Int],
    funny: Option[Int],
    cool: Option[Int],
    source: String)

/** CleanedYelpReview (models.py:40-69) minus wall-clock processing
  * timestamps (added at the sink, graft.streaming).
  */
final case class CleanedReview(
    review_id: String,
    business_id: String,
    user_id: String,
    text: String,
    rating: Int,
    date: Timestamp,
    useful: Int,
    funny: Int,
    cool: Int,
    word_count: Int,
    char_count: Int,
    sentence_count: Int,
    avg_word_length: Double,
    language: String,
    language_confidence: Double,
    data_quality_score: Double,
    is_spam: Boolean,
    is_anomaly: Boolean,
    source: String)

/** DataQualityIssue (models.py:86-98). */
final case class QualityIssue(
    review_id: String,
    issue_type: String,
    field_name: String,
    og_value: Option[String],
    expected_range: Option[String],
    severity: Int)

/** ReviewStats (models.py:101-127) — the reference's declared hourly
  * aggregate, implemented in full by graft.ops.Stats.
  */
final case class ReviewStats(
    window_start: Timestamp,
    total_reviews: Long,
    valid_reviews: Long,
    rejected_reviews: Long,
    avg_quality_score: Option[Double],
    spam_count: Long,
    wrong_language_count: Long,
    rating_1: Long,
    rating_2: Long,
    rating_3: Long,
    rating_4: Long,
    rating_5: Long,
    avg_rating: Option[Double],
    avg_word_count: Option[Double],
    avg_sentence_count: Option[Double])
