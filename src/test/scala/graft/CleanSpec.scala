package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{Clean, Reviews}
import graft.schema.RawReview

/** Hand-computed goldens for the quality pipeline's quirky semantics
  * (SURVEY §2.6 + §5): freshness ≡ 0, practical max score 0.70, rating-0 is
  * missing, sentence_count >= 1, truncate-then-keep at 5000.
  */
class CleanSpec extends AnyFunSuite with Matchers with TestSpark {

  private def annotate(rows: RawReview*): DataFrame = {
    import spark.implicits._
    Clean.annotate(rows.toSeq.toDF())
  }

  private val ts = Timestamp.valueOf("2024-01-01 00:00:00")
  private def ok(id: String, text: String = "this is a perfectly fine review of the place",
                 rating: Option[Double] = Some(5.0)): RawReview =
    RawReview(id, "b1", "u1", rating, text, ts, Some(1), Some(2), Some(3), "test")

  private def row(df: DataFrame, id: String) =
    df.filter(df("review_id") === id).collect().head

  test("perfect review scores exactly 0.70 (freshness always 0, consistency never computed)") {
    val df = annotate(ok("r1"))
    val r = row(df, "r1")
    r.getAs[Boolean]("accepted") shouldBe true
    r.getAs[Double]("freshness_score") shouldBe 0.0
    r.getAs[Double]("completeness_score") shouldBe 1.0
    r.getAs[Double]("validity_score") shouldBe 1.0
    r.getAs[Double]("spam_check_score") shouldBe 1.0
    r.getAs[Double]("data_quality_score") shouldBe 0.70 // NOT 1.0 — the quirk
    r.getAs[Boolean]("is_anomaly") shouldBe false
  }

  test("future-dated review still gets freshness 0 (dead branch preserved)") {
    val r = row(annotate(ok("r1").copy(date =
      Timestamp.valueOf("2999-01-01 00:00:00"))), "r1")
    r.getAs[Double]("freshness_score") shouldBe 0.0
  }

  test("rating 0 is missing (Python truthiness quirk), not out_of_range") {
    val r = row(annotate(ok("r1", rating = Some(0.0))), "r1")
    r.getAs[Boolean]("accepted") shouldBe false
    r.getAs[String]("stage") shouldBe "missing_value"
  }

  test("rating 7 is out_of_range; completeness counts it PRESENT") {
    val r = row(annotate(ok("r1", rating = Some(7.0))), "r1")
    r.getAs[String]("stage") shouldBe "out_of_range"
    r.getAs[Double]("completeness_score") shouldBe 1.0 // is-not-null check
  }

  test("sentence_count is at least 1 for punctuation-free text") {
    val r = row(annotate(ok("r1", text = "no punctuation here at all")), "r1")
    r.getAs[Int]("sentence_count") shouldBe 1
    r.getAs[Int]("word_count") shouldBe 5
  }

  test("over-long text is truncated to 5000, kept, and warned") {
    val longText = ("this is a review with the usual words " * 150)
    longText.length should be > 5000
    val df = annotate(ok("r1", text = longText))
    val r = row(df, "r1")
    r.getAs[Boolean]("accepted") shouldBe true
    r.getAs[Int]("char_count") shouldBe 5000
    val issues = Clean.issues(df).collect().map(_.getAs[String]("issue_type"))
    issues should contain("too_long")
  }

  test("two spam patterns reject; one is tolerated") {
    val one = ok("r1", text = "come visit us at http://example.com for the good stuff")
    val two = ok("r2", text = "buy now at http://example.com and get the discount stuff")
    val df = annotate(one, two)
    row(df, "r1").getAs[String]("stage") shouldBe "accepted"
    row(df, "r2").getAs[String]("stage") shouldBe "spam_detected"
  }

  test("low-confidence language warns but does not reject") {
    // exactly one stopword occurrence -> conf 0.15 < 0.8
    val df = annotate(ok("r1", text = "exceptional service truly remarkable experience overall the food"))
    val r = row(df, "r1")
    r.getAs[String]("language") shouldBe "en"
    r.getAs[Boolean]("accepted") shouldBe true
    val issues = Clean.issues(df).collect().map(_.getAs[String]("issue_type"))
    issues should contain("wrong_language")
  }

  test("no-stopword text is rejected as unsupported_language") {
    val r = row(annotate(ok("r1", text = "zzz qqq www rrr ttt yyy uuu")), "r1")
    r.getAs[String]("stage") shouldBe "unsupported_language"
  }

  test("short text rejects as too_short after spam check order") {
    val r = row(annotate(ok("r1", text = "the bad")), "r1")
    r.getAs[String]("stage") shouldBe "too_short"
  }

  test("mostly-digits text rejects as invalid_format (<40% alphabetic)") {
    val r = row(annotate(
      ok("r1", text = "the 123 456 789 012 345 678 901 234 567 890")), "r1")
    r.getAs[String]("stage") shouldBe "invalid_format"
  }

  test("missing text emits BOTH missing issues when rating is also missing") {
    val raw = ok("r1").copy(text = null, rating = None)
    val df = annotate(raw)
    val issues = Clean.issues(df).collect()
    issues.map(_.getAs[String]("field_name")).sorted shouldBe Array("rating", "text")
    issues.map(_.getAs[Int]("severity")).toSet shouldBe Set(10)
  }

  test("docsAsReviews exercises every rejection stage at sf0.001") {
    val ann = Clean.annotate(Reviews.docsAsReviews(
      Tables.load(spark, "/root/testdata/sf0.001", "documents")))
    val stages = ann.groupBy("stage").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    stages.keySet should contain allOf ("accepted", "missing_value",
      "unsupported_language", "too_short", "out_of_range", "invalid_format")
    // too_long is warn-only: shows up as an issue, not a stage
    val issueTypes = Clean.issues(ann).select("issue_type").distinct()
      .collect().map(_.getString(0)).toSet
    issueTypes should contain("too_long")
  }
}
