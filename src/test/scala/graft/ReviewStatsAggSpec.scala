package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{Clean, Reviews, ReviewStatsAgg, Stats}

/** The typed one-shot Aggregator must agree with the untyped
  * Stats.hourlyStats on every field, for every hour, on real data.
  */
class ReviewStatsAggSpec extends AnyFunSuite with Matchers with TestSpark {

  test("non-integral accepted rating: no histogram bucket, both forms agree") {
    import spark.implicits._
    import graft.schema.RawReview
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def raw(id: String, rating: Double) = RawReview(id, "b1", "u1",
      Some(rating), "this is a perfectly fine review of the place", ts,
      Some(1), Some(0), Some(0), "test")
    val ann = Clean.annotate(Seq(raw("r1", 2.5), raw("r2", 4.0)).toDF())
    val df = Stats.hourlyStats(ann).collect()
    df.length shouldBe 1
    // the column form counts exact equality: 2.5 lands in NO bucket
    (1 to 5).map(k => df.head.getAs[Long](s"rating_$k")) shouldBe
      Seq(0L, 0L, 0L, 1L, 0L)
    val agg = ReviewStatsAgg.hourlyStats(ann).collect().head
    Seq(agg.rating_1, agg.rating_2, agg.rating_3, agg.rating_4,
      agg.rating_5) shouldBe Seq(0L, 0L, 0L, 1L, 0L)
    agg.avg_rating shouldBe Some(3.25) // but it still counts toward the avg
  }

  test("typed Aggregator equals the DataFrame hourly stats") {
    val ann = Clean.annotate(Reviews.docsAsReviews(
      Tables.load(spark, "/root/testdata/sf0.001", "documents")))
    val viaDf = Stats.hourlyStats(ann).collect()
      .map(r => r.getAs[java.sql.Timestamp]("window_start") -> r).toMap
    val viaAgg = ReviewStatsAgg.hourlyStats(ann).collect()
    viaAgg.length shouldBe viaDf.size
    viaAgg.foreach { s =>
      val r = viaDf(s.window_start)
      withClue(s"window ${s.window_start}: ") {
        s.total_reviews shouldBe r.getAs[Long]("total_reviews")
        s.valid_reviews shouldBe r.getAs[Long]("valid_reviews")
        s.rejected_reviews shouldBe r.getAs[Long]("rejected_reviews")
        s.avg_quality_score shouldBe
          Option(r.getAs[java.lang.Double]("avg_quality_score")).map(_.toDouble)
        s.spam_count shouldBe r.getAs[Long]("spam_count")
        s.wrong_language_count shouldBe r.getAs[Long]("wrong_language_count")
        Seq(s.rating_1, s.rating_2, s.rating_3, s.rating_4, s.rating_5) shouldBe
          (1 to 5).map(k => r.getAs[Long](s"rating_$k"))
        s.avg_rating shouldBe
          Option(r.getAs[java.lang.Double]("avg_rating")).map(_.toDouble)
        s.avg_word_count shouldBe
          Option(r.getAs[java.lang.Double]("avg_word_count")).map(_.toDouble)
        s.avg_sentence_count shouldBe
          Option(r.getAs[java.lang.Double]("avg_sentence_count")).map(_.toDouble)
      }
    }
  }
}
