package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Url

/** URL canonicalization + per-domain cap: surface-form collisions resolve
  * to one winner, the cap keeps the first k winners per domain, and every
  * stripped component (scheme, www, query, fragment, trailing slash) is
  * pinned individually.
  */
class UrlSpec extends AnyFunSuite with Matchers with TestSpark {

  private def dedup(rs: (Long, String)*) = {
    import spark.implicits._
    Url.urlDedup(rs.toDF("doc_id", "url"), cap = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(2), r.getString(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
  }

  test("surface variants of one page collapse; min doc_id wins") {
    val m = dedup(
      1L -> "https://www.a.com/x",
      2L -> "http://a.com/x/",
      3L -> "https://a.com/x?utm_source=f&id=3",
      4L -> "https://www.a.com/x#frag",
      5L -> "https://a.com/y")
    (1L to 4L).foreach { id => m(id)._1 shouldBe "a.com/x" }
    m(1L)._3 shouldBe true
    (2L to 4L).foreach { id => m(id)._3 shouldBe false }
    m(5L) shouldBe (("a.com/y", "a.com", true, true))
  }

  test("domain cap keeps the first k canonical winners per domain") {
    val m = dedup(
      1L -> "https://b.com/p1", 2L -> "https://b.com/p2",
      3L -> "https://b.com/p3",      // third winner: capped out
      4L -> "https://b.com/p1/",     // loser: not kept, not counted
      5L -> "https://c.com/q1")      // other domain unaffected
    m(1L)._4 shouldBe true
    m(2L)._4 shouldBe true
    m(3L) shouldBe (("b.com/p3", "b.com", true, false))
    m(4L) shouldBe (("b.com/p1", "b.com", false, false))
    m(5L)._4 shouldBe true
  }

  test("seeded corpus: every doc gets a URL and collisions exist") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = Url.urlDedup(Url.withUrls(docs))
    out.count() shouldBe docs.count()
    val losers = out.filter(!col("url_winner")).count()
    losers should be > 0L
    // kept implies winner
    out.filter(col("kept") && !col("url_winner")).count() shouldBe 0L
    // cap holds per domain
    val over = out.filter(col("kept")).groupBy("domain").count()
      .filter(col("count") > Url.DomainCap)
    over.count() shouldBe 0L
  }
}
