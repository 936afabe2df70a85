package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.TextDedup

/** Train/eval decontamination: k-gram overlap flagging with benchmark
  * self-matches excluded.
  */
class DecontaminateSpec extends AnyFunSuite with Matchers with TestSpark {

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("flags exactly the docs sharing a k-gram; benchmark excluded; " +
      "short docs cannot match") {
    val corpus = df(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "a quick brown fox ran away yesterday evening",       // shares "quick brown fox"
      3L -> "completely different words here entirely",
      4L -> "quick brown",                                        // < k words
      9L -> "the quick brown fox jumps over the lazy dog")        // benchmark doc
    val out = TextDedup.decontaminate(
      corpus, corpus.filter(col("doc_id") === 9L), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc 1 shares all 7 of doc 9's 3-grams; doc 2 shares "quick brown fox"
    out shouldBe Array((1L, 7L), (2L, 1L))
  }

  test("overlap fraction: shared/distinct grams per doc, zero-overlap " +
      "docs kept, benchmark and short docs excluded") {
    val corpus = df(
      1L -> "the quick brown fox jumps over the lazy dog", // 7 grams, 7 shared
      2L -> "a quick brown fox ran away yesterday evening", // 6 grams, 1 shared
      3L -> "completely different words here entirely",     // 3 grams, 0 shared
      4L -> "quick brown",                                  // < k words: absent
      9L -> "the quick brown fox jumps over the lazy dog")  // benchmark: absent
    val out = TextDedup.contaminationOverlap(
      corpus, corpus.filter(col("doc_id") === 9L), k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out shouldBe Array(
      (1L, 7L, 7L, 1.0),
      (2L, 6L, 1L, 0.166667),
      (3L, 3L, 0L, 0.0))
  }

  test("overlap fraction counts DISTINCT grams (repeats collapse)") {
    val corpus = df(
      1L -> "x y z x y z", // grams: "x y z","y z x","z x y","x y z" -> 3 distinct
      9L -> "x y z")
    val out = TextDedup.contaminationOverlap(
      corpus, corpus.filter(col("doc_id") === 9L), k = 3).collect()
    out.length shouldBe 1
    out.head.getLong(1) shouldBe 3L  // n_grams: distinct
    out.head.getLong(2) shouldBe 1L  // only "x y z" shared
  }

  test("8-gram default: only long overlaps match") {
    val shared = "one two three four five six seven eight nine"
    val corpus = df(
      1L -> s"prefix words $shared suffix words",
      2L -> "nothing in common with the benchmark document at all really",
      9L -> shared)
    val out = TextDedup.decontaminate(
      corpus, corpus.filter(col("doc_id") === 9L))
      .collect().map(_.getLong(0))
    out shouldBe Array(1L)
  }

  test("sf0.01 testdata: 171 contaminated docs vs the %97 benchmark") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val out = TextDedup.decontaminate(docs,
      docs.filter(col("doc_id") % 97 === 0),
      k = TextDedup.ContamGramSynthetic)
    out.count() shouldBe 171L
    // no benchmark doc in the output
    out.filter(col("doc_id") % 97 === 0).count() shouldBe 0L
  }

  test("bloom prefilter path returns exactly the exact-join result") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val k = TextDedup.ContamGramSynthetic
    val exact = TextDedup.decontaminate(docs, bench, k).collect().toSeq
    val bloom = TextDedup.decontaminateBloom(docs, bench, k).collect().toSeq
    bloom shouldBe exact
    exact should not be empty
  }

  test("auto tier: gram bound picks exact for a small benchmark, bloom " +
      "above the threshold, and both tiers stay value-identical") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val k = TextDedup.ContamGramSynthetic
    // the decision input: a linear-scan upper bound on benchmark grams
    val bound = TextDedup.contamGramBound(bench, k)
    bound should be > 0L
    bound should be < TextDedup.ContamAutoMaxBroadcastGrams // real sf sizes pick exact
    val exact = TextDedup.decontaminate(docs, bench, k).collect().toSeq
    // default threshold: selector takes the broadcast-exact tier
    TextDedup.decontaminateAuto(docs, bench, k)
      .collect().toSeq shouldBe exact
    // forced-low threshold: selector takes the bloom tier — same values
    TextDedup.decontaminateAuto(docs, bench, k, maxBroadcastGrams = 1L)
      .collect().toSeq shouldBe exact
  }

  test("auto tier gram bound: empty benchmark is 0 and short docs " +
      "contribute no windows") {
    val bench = df(1L -> "a b", 2L -> "") // both under k=3 words
    TextDedup.contamGramBound(bench, 3) shouldBe 0L
    TextDedup.contamGramBound(bench.filter(col("doc_id") === 99L), 3) shouldBe 0L
    TextDedup.contamGramBound(df(1L -> "a b c d"), 3) shouldBe 2L
  }

  test("bloom path with an empty benchmark flags nothing") {
    val corpus = df(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "a quick brown fox ran away yesterday evening")
    val out = TextDedup.decontaminateBloom(
      corpus, corpus.filter(col("doc_id") === 999L), k = 3)
    out.count() shouldBe 0L
  }
}
