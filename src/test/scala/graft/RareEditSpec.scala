package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{TextAnalysis, TextDedup}

/** Goldens for the corpus-statistic scorers added in round 3: rare-token
  * density (frequency join-back) and edit-distance candidate verification.
  */
class RareEditSpec extends AnyFunSuite with Matchers with TestSpark {

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text").selectExpr("doc_id", "text", "'s' AS source")
  }

  test("rare-token density counts corpus frequency <= RareMax, " +
      "token-less docs carry zeros") {
    // freq: a=3, b=1, c=1 -> rare tokens are b and c (RareMax = 2)
    val out = TextAnalysis.rareTokens(
      docsOf((1L, "a a b"), (2L, "a c"), (3L, "   ")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    out shouldBe Array(
      (1L, 3L, 1L, 0.333333),
      (2L, 2L, 1L, 0.5),
      (3L, 0L, 0L, 0.0))
  }

  test("edit verification keeps only candidate pairs within EditMax") {
    // identical docs share every band -> guaranteed LSH candidates with
    // distance 0; the third doc shares no shingle with either
    val corpus = docsOf(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa"))
    val sigs = TextDedup.signatures(corpus)
      .select("doc_id", "shingles", "mh", "bands")
    val out = TextDedup.editPairsOf(sigs, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out shouldBe Array((1L, 2L, 0L))
  }

  test("simhash near-dup join: identical docs pair at hamming 0, " +
      "a one-word change stays near, unrelated docs never pair") {
    val corpus = docsOf(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"), // 1-word change
      (4L, "one two three four five six seven eight"))
    val out = TextDedup.simhashDups(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the identical pair is guaranteed (hamming 0 -> all bands equal)
    out should contain((1L, 2L, 0L))
    // doc 4 shares no vocabulary: never within SimHamMax of 1/2/3
    out.map(p => (p._1, p._2))
      .intersect(Seq((1L, 4L), (2L, 4L), (3L, 4L))) shouldBe empty
    out.foreach { case (_, _, h) => h should be <= TextDedup.SimHamMax.toLong }
  }

  test("bounded levenshtein agrees with the full distance at/below the " +
      "threshold and drops pairs above it") {
    import spark.implicits._
    val pairs = Seq(
      ("abc", "abd"),                      // 1
      ("abc", "abc"),                      // 0
      ("a" * 40, "b" * 40))                // 40 > EditMax
      .toDF("l", "r")
    val got = pairs.select(
      levenshtein(col("l"), col("r"), TextDedup.EditMax).as("bounded"),
      levenshtein(col("l"), col("r")).as("full"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    got(0) shouldBe ((1, 1))
    got(1) shouldBe ((0, 0))
    got(2)._1 shouldBe -1 // bounded short-circuit
    got(2)._2 shouldBe 40
  }
}
