package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.TextAnalysis

/** BM25 keyword relevance (q_bm25) — rational-idf variant. Checks ranking
  * behavior against hand-computed scores on a tiny corpus plus the standard
  * BM25 properties (tf saturation, length normalization, rare-term weight).
  */
class Bm25Spec extends AnyFunSuite with Matchers with TestSpark {

  private def corpus(rows: (Long, String)*) = {
    val s: SparkSession = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def scores(rows: (Long, String)*): Map[Long, Double] =
    TextAnalysis.bm25(corpus(rows: _*), Seq("cat"), topK = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

  test("matches a hand-computed score on a two-doc corpus") {
    // docs: "cat dog" (tf=1, dl=2), "dog mouse" (tf=0, dl=2)
    // N=2, df=1, avgdl=2; idf = (2-1+0.5)/(1+0.5) = 1.0
    // denom = 1 + 1.2*(0.25 + 0.75*2/2) = 1 + 1.2 = 2.2
    // score(doc 1) = 1.0 * (1*2.2)/2.2 = 1.0
    val m = scores(1L -> "cat dog", 2L -> "dog mouse")
    m(1L) shouldBe 1.0 +- 1e-9
    m(2L) shouldBe 0.0
  }

  test("tf saturates: doubling tf less than doubles the score") {
    val m = scores(1L -> "cat dog mouse bird", 2L -> "cat cat dog mouse",
      3L -> "dog dog dog bird")
    m(2L) should be > m(1L)
    m(2L) should be < 2 * m(1L)
  }

  test("length normalization: same tf, shorter doc scores higher") {
    val m = scores(1L -> "cat dog", 2L -> "cat dog mouse bird fish wolf",
      3L -> "dog mouse")
    m(1L) should be > m(2L)
  }

  test("rarer terms carry higher idf weight") {
    val df = corpus(1L -> "cat rare", 2L -> "cat dog", 3L -> "cat dog",
      4L -> "dog fish")
    val out = TextAnalysis.bm25(df, Seq("cat", "rare"), topK = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 1 has both terms; 'rare' (df=1) outweighs 'cat' (df=3)
    out(1L) should be > 2 * out(2L)
  }

  test("registry surface: top-k trimmed, ordered by (score desc, doc_id), " +
      "rare term dominates on the synthetic corpus") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = TextAnalysis.bm25(docs).collect()
    out.length should be <= TextAnalysis.Bm25TopK
    val key = out.map(r => (-r.getDouble(2), r.getLong(0))).toSeq
    key shouldBe key.sorted
    // docs containing the rare term 'dup' must lead the ranking
    val top: Row = out.head
    val topDoc = docs.filter(org.apache.spark.sql.functions.col("doc_id") ===
      top.getLong(0)).head().getAs[String]("text")
    topDoc.toLowerCase.split("\\s+") should contain("dup")
  }
}
