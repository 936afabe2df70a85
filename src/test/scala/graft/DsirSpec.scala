package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.ops.Dsir

/** DSIR importance resampling: rational target-affinity semantics on
  * hand fixtures (score 1 when a doc's grams live only in target-heavy
  * buckets, 0 for disjoint-vocabulary outsiders), bounds p<=q => score
  * in [0,1], and directional separation on real data.
  */
class DsirSpec extends AnyFunSuite with Matchers with TestSpark {

  private def docsOf(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("disjoint vocabularies: target docs score 1, outsiders 0") {
    // target (en) docs use only {alpha beta}, outsiders only {gamma delta}
    // — with disjoint gram sets, p_cnt = q_cnt on target buckets and
    // p_cnt = 0 on outsider buckets (deterministic md5 bucketing; no
    // collision among these 6 grams at 4096 buckets).
    val out = Dsir.importance(docsOf(
      (1L, "alpha beta alpha", "en"),
      (2L, "beta alpha", "en"),
      (3L, "gamma delta gamma", "fr"),
      (4L, "delta gamma", "de")), col("lang") === lit("en"))
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getBoolean(4)))
    out.map(t => (t._1, t._2)) shouldBe
      Array((1L, 1.0), (2L, 1.0), (3L, 0.0), (4L, 0.0))
    // score-0 docs can never be kept; score-1 docs keep iff u < 1 (always)
    out.filter(_._2 == 0.0).forall(!_._3) shouldBe true
    out.filter(_._2 == 1.0).forall(_._3) shouldBe true
  }

  test("empty-gram docs get score 0 and are never kept") {
    val out = Dsir.importance(
      docsOf((1L, "   ", "en"), (2L, "words exist here", "en")),
      col("lang") === lit("en")).collect()
    val empty = out.find(_.getLong(0) == 1L).get
    empty.getLong(1) shouldBe 0L
    empty.getLong(2) shouldBe 0L
    empty.getDouble(3) shouldBe 0.0
    empty.getBoolean(4) shouldBe false
  }

  test("real data: scores bounded in [0,1]; en docs separate upward") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val scored = Dsir.importance(docs, col("lang") === lit("en"))
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    scored.filter(col("score") < 0 || col("score") > 1).count() shouldBe 0L
    val Array(enAvg, otherAvg) = scored
      .groupBy(col("lang") === lit("en")).agg(avg("score"))
      .orderBy(desc("(lang = en)")).collect().map(_.getDouble(1))
    enAvg should be > otherAvg
  }
}
