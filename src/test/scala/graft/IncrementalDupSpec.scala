package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{Corpus, TextDedup}

/** Incremental near-dup detection (q_dedup_incremental): the new batch
  * joins the standing band index; pairs are strictly index-vs-new, the
  * injected near-copies are found, and the result agrees with the
  * full-corpus jaccard pair set restricted to the same split.
  */
class IncrementalDupSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  private def sigs = TextDedup.signatures(Corpus.withNearDups(spark, dir))
    .select("doc_id", "shingles", "mh", "bands")

  test("finds each injected near-copy against its original, " +
      "index-vs-new only") {
    val out = TextDedup.incrementalDups(sigs).collect()
    out.foreach { r =>
      r.getLong(0) should be < TextDedup.NewIdBase // indexed side
      r.getLong(1) should be >= TextDedup.NewIdBase // new side
      r.getDouble(2) should be >= 0.5
    }
    // every injected copy whose original survived signature generation
    // (>= ShingleK words on both sides) pairs with that original
    val ids = sigs.collect().map(_.getLong(0)).toSet
    val expected = ids.filter(id =>
      id >= TextDedup.NewIdBase && ids.contains(id - TextDedup.NewIdBase))
    val found = out.map(r => (r.getLong(1), r.getLong(0))).toMap
    expected.foreach { nid =>
      withClue(s"new doc $nid vs original ${nid - TextDedup.NewIdBase}: ") {
        out.exists(r => r.getLong(1) == nid &&
          r.getLong(0) == nid - TextDedup.NewIdBase) shouldBe true
      }
    }
    found.size should be > 0
  }

  test("agrees with the full-corpus jaccard pair set restricted to the " +
      "index/new split") {
    val full = TextDedup.jaccardPairsOf(sigs).collect()
      .filter(r => r.getLong(0) < TextDedup.NewIdBase &&
        r.getLong(1) >= TextDedup.NewIdBase)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inc = TextDedup.incrementalDups(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    inc shouldBe full
  }
}
