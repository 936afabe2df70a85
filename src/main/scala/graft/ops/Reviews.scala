package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic "review-ization" of the driver's `documents` table into the
  * reference's RawYelpReview surface (`streaming/models.py:22-38`).
  *
  * The testdata has no ratings/ids/dates, so we derive them from `doc_id`
  * with fixed moduli chosen to exercise EVERY branch of the clean pipeline
  * (missing text/rating, rating==0 quirk, out-of-range, too-short, too-long
  * + truncation, <40%-alphabetic). The identical arithmetic lives in the
  * DuckDB oracle SQL (graft.oracle.Sql.rawReviewsCte), so both engines see
  * the same input rows.
  *
  * Mutation map (first match wins):
  *   doc_id % 23 == 0 -> text NULL          (missing_value)
  *   doc_id % 29 == 0 -> first 5 chars      (too_short)
  *   doc_id % 31 == 0 -> repeated past 5000 (too_long + truncate)
  *   doc_id % 37 == 0 -> digits appended    (invalid_format, <40% alpha)
  *   doc_id % 19 == 0 -> rating NULL; else rating = doc_id % 8 (0 => the
  *     "rating 0 is missing" quirk; 6,7 => out_of_range; 1..5 valid)
  *   doc_id %  7 == 0 -> useful NULL (exercises optional-field completeness)
  */
object Reviews {

  def docsAsReviews(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("string").as("review_id"),
      col("source").as("business_id"),
      concat(lit("u"), (col("doc_id") % 50).cast("string")).as("user_id"),
      when(col("doc_id") % 19 === 0, lit(null).cast("double"))
        .otherwise((col("doc_id") % 8).cast("double")).as("rating"),
      when(col("doc_id") % 23 === 0, lit(null).cast("string"))
        .when(col("doc_id") % 29 === 0, substring(col("text"), 1, 5))
        .when(col("doc_id") % 31 === 0,
          expr("repeat(text, cast(floor(5001 / n_chars) as int) + 1)"))
        .when(col("doc_id") % 37 === 0,
          expr("concat(text, ' ', repeat('0123456789 ', " +
            "cast(floor(2 * n_chars / 11) as int) + 1))"))
        .otherwise(col("text")).as("text"),
      // doc_id is modulo'd into int range BEFORE the ANSI cast: review
      // dates wrap every ~190 years of minutes instead of the cast
      // overflowing on corpora whose ids exceed 2^31 (a no-op at every
      // driver SF, where doc_id < 5000; the oracle wraps identically)
      expr("timestamp'2024-01-01 00:00:00' + " +
        "make_interval(0, 0, 0, 0, 0, cast(doc_id % 100000000 as int), 0)")
        .as("date"),
      when(col("doc_id") % 7 === 0, lit(null).cast("int"))
        .otherwise((col("doc_id") % 4).cast("int")).as("useful"),
      (col("doc_id") % 3).cast("int").as("funny"),
      (col("doc_id") % 5).cast("int").as("cool"),
      col("source"))
}
