package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Corpus bigram-LM predictability: MLE conditional probabilities on a
  * hand fixture, zero-bigram docs, and [0,1] bounds on real data.
  */
class LmScoreSpec extends AnyFunSuite with Matchers with TestSpark {

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hand fixture: P(w2|w1) is the corpus MLE") {
    // bigram stream: (a,b) x2 from docs 1/3, (a,c) x1 from doc 2;
    // prefix count a = 3 -> P(b|a) = 2/3, P(c|a) = 1/3
    val out = TextAnalysis.lmScore(docsOf(
      (1L, "a b"), (2L, "a c"), (3L, "a b"), (4L, "solo")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out shouldBe Array(
      (1L, 1L, 0.666667),
      (2L, 1L, 0.333333),
      (3L, 1L, 0.666667),
      (4L, 0L, 0.0))
  }

  test("stereotyped text outscores a rare continuation of a shared prefix") {
    // docs 1-3 repeat "the cat sat" -> P(cat|the) = 3/4, P(sat|cat) = 1;
    // doc 4's "the dog ran" pays for the rare continuation:
    // P(dog|the) = 1/4, P(ran|dog) = 1 -> avg 0.625
    val out = TextAnalysis.lmScore(docsOf(
      (1L, "the cat sat"), (2L, "the cat sat"), (3L, "the cat sat"),
      (4L, "the dog ran")))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    out(1L) shouldBe 0.875 // (3/4 + 1) / 2
    out(4L) shouldBe 0.625
    out(1L) should be > out(4L)
  }

  test("native bigram-pair stream ≡ declarative words/struct chain (multiset)") {
    // the r8 native pass must emit exactly the (doc_id, h56(w1),
    // h56("w1 w2")) multiset the prior interpreted HOF form produced
    import graft.ops.TextHash.{h56, words}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(200)
    val native = docs.select(col("doc_id"),
        explode(graft.functions.BigramPairHashes(lower(col("text"))))
          .as("bg"))
      .select(col("doc_id"), col("bg.h1").as("h1"), col("bg.hb").as("hb"))
    val w = words(col("text"))
    val declarative = docs.select(col("doc_id"),
        explode(when(org.apache.spark.sql.functions.size(w) >= 2,
          transform(sequence(lit(0), org.apache.spark.sql.functions.size(w) - 2),
            i => struct(element_at(w, i + 1).as("w1"),
              element_at(w, i + 2).as("w2"))))
          .otherwise(array())).as("bg"))
      .select(col("doc_id"), h56(col("bg.w1")).as("h1"),
        h56(concat(col("bg.w1"), lit(" "), col("bg.w2"))).as("hb"))
    val cnt = Seq("doc_id", "h1", "hb")
    native.groupBy(cnt.map(col): _*).count()
      .except(declarative.groupBy(cnt.map(col): _*).count())
      .count() shouldBe 0L
    declarative.count() shouldBe native.count()
    native.count() should be > 0L
  }

  test("real data: probabilities bounded in [0,1]") {
    val out = TextAnalysis.lmScore(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"))
    out.filter(col("avg_condp") < 0 || col("avg_condp") > 1)
      .count() shouldBe 0L
    out.count() should be > 0L
  }
}
