package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.ops.HybridRank

/** Reciprocal-rank fusion semantics: RRF values follow 1/(K+rank) sums,
  * docs present in BOTH lists outrank same-position singletons, and the
  * result is stable across runs.
  */
class HybridRankSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  test("rrf arithmetic and ordering invariants") {
    val out = HybridRank.hybridRank(spark, dir).collect()
    out.length should be <= HybridRank.OutK
    out.length should be > 0
    val K = HybridRank.RrfK
    out.foreach { r =>
      val kw = Option(r.get(1)).map(_.asInstanceOf[Int])
      val sem = Option(r.get(2)).map(_.asInstanceOf[Int])
      val expected = kw.map(x => 1.0 / (K + x)).getOrElse(0.0) +
        sem.map(x => 1.0 / (K + x)).getOrElse(0.0)
      r.getDouble(3) shouldBe (math.rint(expected * 1e6) / 1e6 +- 1e-9)
      (kw.isDefined || sem.isDefined) shouldBe true
    }
    // output is sorted by fused score desc
    val scores = out.map(_.getDouble(3)).toSeq
    scores shouldBe scores.sorted.reverse
  }

  test("a doc ranked #1 in both lists beats any single-list doc") {
    val out = HybridRank.hybridRank(spark, dir).collect()
    val both = out.filter(r => r.get(1) != null && r.get(2) != null)
    val single = out.filter(r => r.get(1) == null || r.get(2) == null)
    if (both.nonEmpty && single.nonEmpty) {
      both.map(_.getDouble(3)).min should be >=
        (single.map(_.getDouble(3)).max - 1.0 / HybridRank.RrfK)
    }
    HybridRank.hybridRank(spark, dir).collect() shouldBe out
  }
}
