package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

import graft.rules.Rules._

/** The full `clean_review` pipeline (`streaming/quality_engine.py:223-358`)
  * as ONE declarative DataFrame transform. The reference evaluates an ordered
  * short-circuit filter chain per record; we compute the same decision as a
  * single wide projection — every record is annotated with its (first-
  * failure) rejection stage, the accumulated issue list, text features,
  * sub-scores and the final quality score. Catalyst's common-subexpression
  * elimination + whole-stage codegen make this a single scan-project pass
  * with no shuffles — at 100 TB this is embarrassingly parallel.
  *
  * Stage order (reject unless noted):
  *   1. missing text and/or missing rating (rating==0 counts as missing —
  *      `not raw_review.rating`, quality_engine.py:226)         [both issues]
  *   2. language not in SUPPORTED_LANGUAGES
  *   3. language confidence < 0.8            -> WARN only (record continues)
  *   4. spam (>=2 of 5 patterns)
  *   5. text shorter than 10 chars
  *   6. text longer than 5000 chars          -> WARN + truncate to 5000
  *   7. rating outside [1, 5]
  *   8. pydantic re-validation (models.py:71-83): cleaned text empty after
  *      strip, or < 40% alphabetic            -> invalid_format
  *
  * Scoring subtleties (preserved): validity + spam sub-scores use the RAW
  * (pre-truncation) text; features use the TRUNCATED text; the output text
  * is the truncated text TRIMMED (the pydantic validator returns v.strip()).
  */
object Clean {

  val IssueFields: Seq[String] =
    Seq("issue_type", "field_name", "og_value", "expected_range", "severity")

  private def issue(issueType: String, fieldName: String, ogValue: Column,
                    expectedRange: Column, severity: Int): Column =
    struct(
      lit(issueType).as("issue_type"),
      lit(fieldName).as("field_name"),
      ogValue.cast(StringType).as("og_value"),
      expectedRange.cast(StringType).as("expected_range"),
      lit(severity).as("severity"))

  private val nullStr = lit(null).cast(StringType)

  /** Annotate a RawYelpReview-shaped DataFrame (review_id, business_id,
    * user_id, rating, text, date, useful, funny, cool, source) with
    * language, features, sub-scores, score, `accepted`, `stage` and
    * `issues: array<struct>`.
    */
  def annotate(raw: DataFrame): DataFrame = {
    val text = col("text")
    val rating = col("rating")

    val textMissing = TextFeatures.emptyText(text)
    val ratingMissing = rating.isNull || rating === 0 // Python truthiness
    val lang = Language.language(text)
    val conf = Language.confidence(text)
    val langUnsupported = !lang.isin(SupportedLanguages: _*)
    val lowConf = conf < lit(LangConfThreshold)
    val spamHit = Spam.isSpam(text)
    val rawLen = length(text)
    val tooShort = rawLen < TextMinLength
    val tooLong = rawLen > TextMaxLength
    val cleanedText = when(tooLong, substring(text, 1, TextMaxLength))
      .otherwise(text)
    val ratingOut = rating < RatingMin || rating > RatingMax
    // pydantic validator on the cleaned (truncated, unstripped) text
    val cleanedLen = length(cleanedText)
    val alphaCount = TextFeatures.charClassCount(cleanedText, AlphaClass)
    val strippedEmpty = length(trim(cleanedText)) === 0
    val invalidFormat =
      strippedEmpty || (alphaCount / cleanedLen) < lit(MinAlphaRatio)

    // cumulative reachability of each stage
    val pastMissing = !(textMissing || ratingMissing)
    val pastLang = pastMissing && !langUnsupported
    val pastSpam = pastLang && !spamHit
    val pastShort = pastSpam && !tooShort
    val pastRange = pastShort && !ratingOut
    val accepted = pastRange && !invalidFormat

    val stage = when(!pastMissing, lit("missing_value"))
      .when(!pastLang, lit("unsupported_language"))
      .when(!pastSpam, lit("spam_detected"))
      .when(!pastShort, lit("too_short"))
      .when(!pastRange, lit("out_of_range"))
      .when(!accepted, lit("invalid_format"))
      .otherwise(lit("accepted"))

    // issue accumulation in reference emission order
    val issues = filter(array(
      when(textMissing,
        issue("missing_value", "text", nullStr, nullStr, SevMissing)),
      when(ratingMissing,
        issue("missing_value", "rating", nullStr, nullStr, SevMissing)),
      when(pastMissing && langUnsupported,
        issue("unsupported_language", "text", lang,
          lit(s"['${SupportedLanguages.mkString("', '")}']"),
          SevUnsupportedLanguage)),
      when(pastLang && lowConf,
        issue("wrong_language", "language_confidence",
          conf.cast(DecimalType(4, 2)),
          lit(s">=$LangConfThreshold"), SevWrongLanguage)),
      when(pastLang && spamHit,
        issue("spam_detected", "text", Spam.matchedPatternsRepr(text),
          nullStr, SevSpam)),
      when(pastSpam && tooShort,
        issue("too_short", "text", rawLen,
          lit(s">=$TextMinLength"), SevTooShort)),
      when(pastShort && tooLong,
        issue("too_long", "text", rawLen,
          lit(s"<=$TextMaxLength"), SevTooLong)),
      when(pastShort && ratingOut,
        issue("out_of_range", "rating", rating,
          lit(s"$RatingMin-$RatingMax"), SevOutOfRange)),
      when(pastRange && invalidFormat,
        issue("invalid_format", "multiple",
          when(strippedEmpty, lit("Text cannot be empty or whitespace"))
            .otherwise(
              lit("Text must contain at least 40% alphabetic characters")),
          nullStr, SevInvalidFormat))
    ), i => i.isNotNull)

    val completeness = Quality.completeness(
      required = Seq(col("review_id"), col("business_id"), col("user_id"),
        text, rating, col("date")),
      optional = Seq(col("useful"), col("funny"), col("cool")))
    val validity = Quality.validity(text, rating) // RAW text + rating
    val freshness = Quality.freshness(col("date"))
    val spamCheck = Spam.spamScore(text) // RAW text
    val score =
      Quality.score(completeness, validity, freshness, spamCheck)

    raw.withColumns(Map(
      "language" -> lang,
      "language_confidence" -> conf,
      "cleaned_text" -> cleanedText,
      "word_count" -> TextFeatures.wordCount(cleanedText),
      "char_count" -> TextFeatures.charCount(cleanedText),
      "sentence_count" -> TextFeatures.sentenceCount(cleanedText),
      "avg_word_length" -> TextFeatures.avgWordLength(cleanedText),
      "completeness_score" -> completeness,
      "validity_score" -> validity,
      "freshness_score" -> freshness,
      "spam_check_score" -> spamCheck,
      "data_quality_score" -> score,
      "is_anomaly" -> Quality.isAnomaly(score),
      "stage" -> stage,
      "accepted" -> accepted,
      "issues" -> issues))
  }

  /** Accepted records in CleanedYelpReview shape (models.py:40-69), minus the
    * wall-clock ingestion/processing timestamps (non-deterministic; the
    * streaming layer adds them — graft.streaming).
    */
  def cleaned(annotated: DataFrame): DataFrame =
    annotated.filter(col("accepted")).select(
      col("review_id"), col("business_id"), col("user_id"),
      trim(col("cleaned_text")).as("text"), // validator returns v.strip()
      col("rating").cast("int").as("rating"), // CleanedYelpReview.rating: int
      col("date"),
      coalesce(col("useful"), lit(0)).as("useful"), // `useful or 0`
      coalesce(col("funny"), lit(0)).as("funny"),
      coalesce(col("cool"), lit(0)).as("cool"),
      col("word_count"), col("char_count"), col("sentence_count"),
      col("avg_word_length"), col("language"), col("language_confidence"),
      col("data_quality_score"),
      lit(false).as("is_spam"), // always false on accepted (:342)
      col("is_anomaly"), col("source"))

  /** The issue stream: one row per issue (the reference's 1->0..n Generator
    * shape, faust_app.py:168-170), via the built-in explode.
    */
  def issues(annotated: DataFrame): DataFrame =
    annotated.filter(size(col("issues")) > 0)
      .select(col("review_id"), explode(col("issues")).as("issue"))
      .select(col("review_id") +: IssueFields.map(f => col(s"issue.$f").as(f)): _*)
}
