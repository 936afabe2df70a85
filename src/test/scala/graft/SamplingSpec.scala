package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Sampling
import graft.Tables

/** Deterministic selection layer: split stability, split proportions, and
  * budgeted mixing behavior on the real documents table.
  */
class SamplingSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.01"
  private def docs = Tables.load(spark, dir, "documents")

  test("docSplit is a pure function of doc_id: rerun-identical, " +
      "unaffected by corpus growth, roughly 90/5/5") {
    val a = Sampling.docSplit(docs).collect()
    val b = Sampling.docSplit(docs).collect()
    a shouldBe b
    // a doc's split must not change when OTHER docs arrive
    val grown = Sampling.docSplit(
      docs.unionAll(docs.select((col("doc_id") + 500000).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    a.foreach(r => grown(r.getLong(0)) shouldBe r.getString(2))
    // proportions: md5 is uniform, so 500 docs land near 450/25/25
    val byS = a.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    byS("train").toDouble should be(450.0 +- 40)
    byS("val").toDouble should be(25.0 +- 15)
    byS("test").toDouble should be(25.0 +- 15)
    byS.values.sum shouldBe 500
  }

  test("corpusMix allocates the budget uniformly and caps frac at 1") {
    val mix = Sampling.corpusMix(docs).collect()
    mix.length shouldBe 20
    // uniform target: budget / n_sources
    mix.foreach(_.getDouble(3) shouldBe 500.0)
    mix.foreach { r =>
      r.getDouble(4) should be > 0.0
      r.getDouble(4) should be <= 1.0
    }
    // a huge budget caps every fraction at exactly 1
    Sampling.corpusMix(docs, budget = 1e9).collect()
      .foreach(_.getDouble(4) shouldBe 1.0)
  }

  test("mixedSample keeps ~sample_frac of each source and is " +
      "a subset of the corpus") {
    val frac = Sampling.corpusMix(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    val kept = Sampling.mixedSample(docs).collect()
    val bySource = kept.groupBy(_.getString(1)).view.mapValues(_.length)
    bySource.toMap.foreach { case (src, n) =>
      // 25 docs/source; binomial(25, frac) stays within +-5 of the mean
      // for the md5 "uniform" at this seed — loose band, deterministic data
      n.toDouble should be(25 * frac(src) +- 8)
    }
    // full budget keeps everything
    Sampling.mixedSample(docs, budget = 1e9).count() shouldBe docs.count()
  }

  test("weightedSample keeps exactly k docs per source, rerun-identical, " +
      "with nonpositive keys and weights >= 1") {
    val a = Sampling.weightedSample(docs).collect()
    val b = Sampling.weightedSample(docs).collect()
    a shouldBe b
    val bySource = a.groupBy(_.getString(0))
    bySource.size shouldBe 20
    bySource.values.foreach(_.length shouldBe Sampling.WeightedK)
    a.foreach { r =>
      r.getLong(2) should be >= 1L
      r.getDouble(3) should be <= 0.0
    }
  }

  test("weightedSample selection mass follows the weights: a handful of " +
      "heavy docs displaces a crowd of light ones") {
    import spark.implicits._
    // 30 one-word docs vs 10 thousand-word docs in one source: an A-ES
    // key at w=1000 beats a w=1 key unless the light draw lands within
    // ~|ln u|/1000 of 1.0 — md5 draws nowhere near that; all 10 heavy
    // docs must be sampled (deterministic given the fixed hash)
    val light = (1L to 30L).map(i => (i, "word", "s"))
    val heavy = (31L to 40L).map(i =>
      (i, Seq.fill(1000)("w").mkString(" "), "s"))
    val sample = Sampling
      .weightedSample((light ++ heavy).toDF("doc_id", "text", "source"))
      .collect()
    sample.length shouldBe Sampling.WeightedK
    sample.count(_.getLong(1) >= 31L) shouldBe 10
    // and the uniform reservoir on the same frame does NOT concentrate
    // on the heavy docs (weighting is the sampler, not the hash)
    val uni = Sampling
      .reservoir((light ++ heavy).toDF("doc_id", "text", "source"))
      .collect()
    uni.count(_.getLong(1) >= 31L) should be < 10
  }
}
