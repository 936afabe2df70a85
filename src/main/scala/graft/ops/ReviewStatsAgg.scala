package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.schema.ReviewStats

/** U6 (SURVEY §2.8): typed single-pass Aggregator producing the full
  * ReviewStats as ONE value per event-hour group — the Dataset[T] form of
  * Stats.hourlyStats (equivalence is spec'd). Catalyst still plans partial
  * (map-side reduce) + final merge, so the shuffle carries one buffer per
  * (hour, partition).
  */
object ReviewStatsAgg {

  /** The slice of an annotated row the aggregate consumes. */
  final case class AnnLite(
      window_start: Timestamp,
      accepted: Boolean,
      stage: String,
      data_quality_score: Double,
      rating: Option[Double],
      word_count: Int,
      sentence_count: Int)

  final case class Buf(
      var windowStart: Timestamp,
      var total: Long, var valid: Long,
      var qualitySum: Double,
      var spam: Long, var wrongLang: Long,
      var hist: Array[Long], // ratings 1..5 of accepted rows
      var ratingSum: Double, var wcSum: Long, var scSum: Long)

  val agg: Aggregator[AnnLite, Buf, ReviewStats] =
    new Aggregator[AnnLite, Buf, ReviewStats] {
      def zero: Buf =
        Buf(null, 0, 0, 0.0, 0, 0, Array.fill(5)(0L), 0.0, 0, 0)

      def reduce(b: Buf, a: AnnLite): Buf = {
        if (b.windowStart == null) b.windowStart = a.window_start
        b.total += 1
        if (a.accepted) {
          b.valid += 1
          b.qualitySum += a.data_quality_score
          a.rating.foreach { r =>
            b.ratingSum += r
            // bucket only integral ratings — Stats.hourlyStats counts
            // `rating === k` exact equality, so a 2.5 must not land in
            // rating_2 (truncation would diverge from the column form)
            val k = r.toInt
            if (k >= 1 && k <= 5 && r == k.toDouble) b.hist(k - 1) += 1
          }
          b.wcSum += a.word_count
          b.scSum += a.sentence_count
        }
        if (a.stage == "spam_detected") b.spam += 1
        if (a.stage == "unsupported_language") b.wrongLang += 1
        b
      }

      def merge(x: Buf, y: Buf): Buf = {
        if (x.windowStart == null) x.windowStart = y.windowStart
        x.total += y.total; x.valid += y.valid
        x.qualitySum += y.qualitySum
        x.spam += y.spam; x.wrongLang += y.wrongLang
        (0 until 5).foreach(i => x.hist(i) += y.hist(i))
        x.ratingSum += y.ratingSum; x.wcSum += y.wcSum; x.scSum += y.scSum
        x
      }

      def finish(b: Buf): ReviewStats = {
        def avg(sum: Double): Option[Double] =
          if (b.valid == 0) None
          else Some(BigDecimal(sum / b.valid)
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
        ReviewStats(b.windowStart, b.total, b.valid, b.total - b.valid,
          avg(b.qualitySum), b.spam, b.wrongLang,
          b.hist(0), b.hist(1), b.hist(2), b.hist(3), b.hist(4),
          avg(b.ratingSum), avg(b.wcSum.toDouble), avg(b.scSum.toDouble))
      }

      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[ReviewStats] = Encoders.product[ReviewStats]
    }

  /** Typed hourly stats: one ReviewStats per event hour. */
  def hourlyStats(annotated: org.apache.spark.sql.DataFrame)
      : Dataset[ReviewStats] = {
    val spark = annotated.sparkSession
    import org.apache.spark.sql.functions._
    import spark.implicits._
    annotated
      .select(
        date_trunc("hour", col("date")).as("window_start"),
        col("accepted"), col("stage"), col("data_quality_score"),
        col("rating"), col("word_count"), col("sentence_count"))
      .as[AnnLite]
      .groupByKey(_.window_start.getTime)
      .agg(agg.toColumn)
      .map(_._2)
  }
}
