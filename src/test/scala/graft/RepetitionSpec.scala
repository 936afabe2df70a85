package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.TextAnalysis

/** Gopher-style repetition signals: exact fractions on crafted docs. */
class RepetitionSpec extends AnyFunSuite with Matchers with TestSpark {

  test("ngram novelty: shared 5-grams across docs lower novelty") {
    import spark.implicits._
    // docs 1 and 2 share their first 5-gram ("a b c d e"); doc 3 is
    // fully unique; doc 4 is too short for any 5-gram
    val out = TextAnalysis.ngramNovelty(Seq(
      (1L, "a b c d e f"),          // grams: abcde, bcdef -> 1 shared
      (2L, "a b c d e x"),          // grams: abcde, bcdex -> 1 shared
      (3L, "p q r s t u v"),        // 3 grams, none shared
      (4L, "one two"))              // no grams
      .toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out(1L) shouldBe ((2L, 1L, 0.5))
    out(2L) shouldBe ((2L, 1L, 0.5))
    out(3L) shouldBe ((3L, 0L, 1.0))
    out(4L) shouldBe ((0L, 0L, 1.0))
  }

  private def rows(rs: (Long, String)*) = {
    import spark.implicits._
    TextAnalysis.repetition(rs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
  }

  test("tfidf keyterms: rarer words outrank common ones; k bounds output") {
    import spark.implicits._
    // "x" appears in 1 of 3 docs, "common" in all 3: idf 3/1 vs 3/3.
    // doc 1 has 4 distinct words -> only top 3 survive the heap.
    val out = TextAnalysis.keyterms(Seq(
      (1L, "common x x zeta omega"),
      (2L, "common other words"),
      (3L, "common more words"))
      .toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val d1 = out.filter(_._1 == 1L)
    d1.length shouldBe 3
    // tf=2, df=1, N=3 -> 2*3/1 = 6.0 for "x"; zeta/omega tf=1 df=1 -> 3.0
    d1.head shouldBe ((1L, "x", 2L, 1L, 6.0))
    d1.map(_._2) shouldBe Array("x", "omega", "zeta") // score, then word
    // "common": tf=1, df=3 -> 1.0 everywhere; dropped from doc 1 (rank 4)
    d1.map(_._2) should not contain "common"
    out.filter(_._1 == 2L).map(_._2).toSet shouldBe
      Set("common", "other", "words")
  }

  test("looped generation scores high; varied text scores low") {
    val m = rows(
      1L -> "buy now buy now buy now buy now",       // 8 words, 4 distinct... 2
      2L -> "every word here is completely different",
      3L -> "",                                       // empty: all zeros
      4L -> "single")                                 // one word: no bigrams
    // doc 1: words=8, distinct=2 -> dup 0.75; bigrams: "buy now" x4,
    // "now buy" x3 of 7 slots -> top = 4/7
    m(1L) shouldBe ((8, 0.75, math.rint(4.0 / 7 * 1e6) / 1e6))
    m(2L)._2 shouldBe 0.0
    m(3L) shouldBe ((0, 0.0, 0.0))
    m(4L) shouldBe ((1, 0.0, 0.0))
  }
}
