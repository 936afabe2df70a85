package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{Anomaly, TextAnalysis}

/** Gopher word-level quality rules + hourly volume anomaly: exact values
  * on crafted fixtures, including each rule's reject precedence and the
  * zero-variance z-score guard.
  */
class GopherAnomalySpec extends AnyFunSuite with Matchers with TestSpark {

  private def gopher(rs: (Long, String)*) = {
    import spark.implicits._
    TextAnalysis.gopherRules(rs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getBoolean(5), Option(r.getString(6))))).toMap
  }

  test("each rule rejects in the published precedence order") {
    val good = ("the word " * 30).trim            // 60 words, stopword-rich
    val m = gopher(
      1L -> good,
      2L -> "too short for the gopher gate",      // < 50 words
      // 50 words but mean word length > 10 (every word 11 chars)
      3L -> Array.fill(50)("abcdefghijk").mkString(" "),
      // 50 short words, <80% alphabetic (30 of 50 are digit runs)
      4L -> (Array.fill(20)("the") ++ Array.fill(30)("123")).mkString(" "),
      // alphabetic, right lengths, but zero stopwords
      5L -> Array.fill(50)("zebra").mkString(" "))
    m(1L) shouldBe ((60, true, None))
    m(2L)._3 shouldBe Some("word_count")
    m(3L)._3 shouldBe Some("mean_word_len")
    m(4L)._3 shouldBe Some("alpha_frac")
    m(5L)._3 shouldBe Some("stopwords")
    m.values.count(_._2) shouldBe 1
  }

  test("boundary doc at exactly 50 words / mean length 3 keeps") {
    // 50 three-char words incl. 2 stopwords -> every threshold inclusive
    val doc = (Array.fill(48)("cat") ++ Array("the", "was")).mkString(" ")
    val m = gopher(1L -> doc)
    m(1L) shouldBe ((50, true, None))
  }

  private def ts(day: Int, hour: Int) =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:30:00")

  test("hourly z-scores flag the spike hour; flat series guards to 0") {
    import spark.implicits._
    // 'click': hours with 1,1,1,1,6 events -> mean 2, the 6-hour spikes;
    // 'view': identical counts every hour -> zero variance -> z = 0
    val rows =
      (1 to 4).map(h => (ts(1, h), "click")) ++
        Seq.fill(6)((ts(1, 5), "click")) ++
        (1 to 3).flatMap(h => Seq.fill(2)((ts(1, h), "view")))
    val df = rows.zipWithIndex
      .map { case ((t, e), i) => (i.toLong, t, e) }
      .toDF("event_id", "ts", "event_type")
    val out = Anomaly.hourlyAnomaly(df).collect()
    val click = out.filter(_.getString(0) == "click")
    click.map(_.getLong(2)).sorted shouldBe Array(1L, 1L, 1L, 1L, 6L)
    // n=5, s1=10, s2=40: den = sqrt(5*40-100) = 10; spike z = (5*6-10)/10
    val spike = click.filter(_.getLong(2) == 6L).head
    spike.getDouble(3) shouldBe 2.0
    // z == 2.0 is NOT > 2.0 — threshold is strict in both engines
    spike.getBoolean(4) shouldBe false
    val others = click.filter(_.getLong(2) == 1L)
    others.foreach { r =>
      r.getDouble(3) shouldBe -0.5
      r.getBoolean(4) shouldBe false
    }
    val view = out.filter(_.getString(0) == "view")
    view.foreach { r =>
      r.getDouble(3) shouldBe 0.0
      r.getBoolean(4) shouldBe false
    }
  }
}
