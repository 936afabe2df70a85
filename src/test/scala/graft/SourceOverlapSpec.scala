package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{Corpus, TextDedup}

/** Cross-source near-dup matrix: must equal the naive recomputation from
  * the verified pair list, with the documented directional semantics.
  */
class SourceOverlapSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.01"

  test("matrix equals the naive per-pair recomputation and is " +
      "directionally symmetric in n_pairs") {
    val corpus = Corpus.withNearDups(spark, dir)
    val pairs = TextDedup.jaccardPairs(corpus)
    val got = TextDedup.sourceOverlap(corpus, pairs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap

    val srcOf = corpus.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nDocs = srcOf.values.groupBy(identity).view.mapValues(_.size).toMap
    val pl = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val directional = pl.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val want = directional.groupBy { case (x, y) => (srcOf(x), srcOf(y)) }
      .map { case ((sa, sb), ps) =>
        (sa, sb) -> (ps.length.toLong, ps.map(_._1).distinct.length.toLong,
          nDocs(sa).toLong,
          ps.map(_._1).distinct.length.toDouble / nDocs(sa))
      }
    got shouldBe want
    // every unordered pair shows up in both directions
    got.foreach { case ((a, b), (np, _, _, _)) =>
      withClue(s"($a,$b): ") { got((b, a))._1 shouldBe np }
    }
    // the injected near-copies guarantee a non-trivial matrix
    got.values.map(_._1).sum should be > 0L
  }
}
