package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{Corpus, TextDedup}

/** Asymmetric containment on LSH candidates: the excerpt corpus's
  * subset relations are reported with the right direction and magnitude,
  * and sibling-overlap pairs (high Jaccard, no subset relation) stay out.
  */
class ContainmentSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.01"

  private def row(doc: Long, text: String) =
    (doc, text, "src")

  private def frame(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("excerpt copies are flagged with containment 1.0 on the " +
      "excerpt side and a strictly smaller share of the original") {
    val pairs = TextDedup.containmentPairs(Corpus.withExcerpts(spark, dir))
      .collect()
    pairs should not be empty
    val excerptPairs = pairs.filter(r =>
      r.getLong(1) == r.getLong(0) + 200000)
    excerptPairs should not be empty
    excerptPairs.foreach { r =>
      withClue(s"pair (${r.getLong(0)}, ${r.getLong(1)}): ") {
        // doc_b is the excerpt: every one of its shingles is in the
        // original, so containment in that direction is exactly 1
        r.getDouble(3) shouldBe 1.0
        // and the original is NOT inside the excerpt
        r.getDouble(2) should be < 1.0
        r.getDouble(2) should be >= 0.4 // ~60% of words => ~58% shingles
      }
    }
  }

  test("a one-third excerpt is caught at containment 1.0 while its " +
      "Jaccard sits far below the 0.5 near-dup bar") {
    // 90 distinct words, excerpt = first 30 — shingle Jaccard ~ 28/88;
    // a band collision at this Jaccard is hash-luck, so the corpus also
    // carries a 60%-excerpt pair that collides with near-certainty.
    val words = (1 to 90).map(i => s"w$i")
    val corpus = frame(Seq(
      row(1L, words.mkString(" ")),
      row(2L, words.take(30).mkString(" ")),
      row(3L, words.take(54).mkString(" "))))
    val got = TextDedup.containmentPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // the 60% excerpt must be found (8 bands x 2 rows at j~0.6)
    val (ca, cb) = got((1L, 3L))
    cb shouldBe 1.0
    ca should be < 0.65 // Jaccard == ca here: subset => |A∩B|/|A∪B| = |B|/|A|
    // whichever excerpt pairs LSH surfaced, none is a false positive:
    got.keys.foreach { case (a, b) =>
      Set((1L, 2L), (1L, 3L), (2L, 3L)) should contain((a, b))
    }
  }

  test("sibling half-overlap (neither doc inside the other) is not " +
      "emitted even when LSH pairs it") {
    val shared = (1 to 60).map(i => s"s$i")
    val corpus = frame(Seq(
      row(1L, ((1 to 40).map(i => s"a$i") ++ shared).mkString(" ")),
      row(2L, ((1 to 40).map(i => s"b$i") ++ shared).mkString(" "))))
    // containment ~ 0.59 in both directions < 0.9
    TextDedup.containmentPairs(corpus).collect() shouldBe empty
  }
}
