package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.TextAnalysis

/** Token-audit queries must be consistent with the per-doc BPE counts
  * they aggregate (same native expression, same frozen merges).
  */
class TokenAuditSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.01"

  private lazy val docs = Tables.load(spark, dir, "documents")
  private lazy val perDoc = TextAnalysis.bpeTokens(docs).collect()
    .map(r => r.getLong(0) -> r.getLong(2)).toMap
  private lazy val meta = docs.select("doc_id", "source", "lang").collect()
    .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap

  test("histogram buckets partition the corpus and conserve tokens") {
    val out = TextAnalysis.tokenHistogram(docs).collect()
    out.map(_.getLong(2)).sum shouldBe perDoc.size
    out.map(_.getLong(3)).sum shouldBe perDoc.values.sum
    // every row agrees with the naive bucket-and-count
    val edges = TextAnalysis.HistEdges
    def bucketOf(n: Long) = edges.reverse.find(n >= _).getOrElse(0L)
    val want = perDoc.toSeq
      .groupBy { case (id, n) => (meta(id)._1, bucketOf(n)) }
      .view.mapValues(ds => (ds.size.toLong, ds.map(_._2).sum)).toMap
    out.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      withClue(s"$key: ") {
        (r.getLong(2), r.getLong(3)) shouldBe want(key)
        r.getDouble(4) shouldBe (r.getLong(2).toDouble /
          meta.values.count(_._1 == r.getString(0)))
      }
    }
    out.length shouldBe want.size
  }

  test("fertility equals the per-language ratio of summed counts") {
    val out = TextAnalysis.tokenizerFertility(docs).collect()
    val wordsOf = TextAnalysis.bpeTokens(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = perDoc.keys.toSeq.groupBy(id => meta(id)._2)
      .view.mapValues { ids =>
      val w = ids.map(wordsOf).sum
      val t = ids.map(perDoc).sum
      (ids.size.toLong, w, t, if (w > 0) t.toDouble / w else 0.0)
    }.toMap
    out.foreach { r =>
      withClue(s"${r.getString(0)}: ") {
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)) shouldBe
          want(r.getString(0))
      }
    }
    out.length shouldBe want.size
  }
}
