package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.EmbedSim

/** Embedding-space decontamination: the planted perturbed copies (and
  * only they) are flagged against their benchmark originals, and every
  * training vector is annotated exactly once.
  */
class SemDecontamSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.01"

  test("perturbed benchmark copies are flagged against their originals; " +
      "the background corpus stays clean") {
    val out = EmbedSim.decontaminateSemantic(spark, dir).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // one annotation per corpus vector (corpus = all + perturbed - bench)
    val base = Tables.load(spark, dir, "embeddings")
    val n = base.count()
    val nBench = base.filter(col("vec_id") % EmbedSim.SemBenchMod === 0)
      .count()
    out.length.toLong shouldBe (n - nBench) + nBench // rest + copies
    // every perturbed copy is contaminated, attributed to its original
    val copies = out.filter(_.getLong(0) >= 100000L)
    copies.length.toLong shouldBe nBench
    copies.foreach { r =>
      withClue(s"copy ${r.getLong(0)}: ") {
        r.getBoolean(3) shouldBe true
        r.getLong(1) shouldBe r.getLong(0) - 100000L
        r.getDouble(2) should be >= EmbedSim.SemThreshold
      }
    }
    // and NOTHING else is: the 0.9 bar cleanly separates the planted
    // leakage from the ~0.5 background maximum
    out.filter(_.getLong(0) < 100000L).foreach { r =>
      withClue(s"background ${r.getLong(0)}: ") {
        r.getBoolean(3) shouldBe false
        r.getDouble(2) should be < 0.8
      }
    }
    // benchmark members themselves are not annotated (they are the probe
    // set, not the training corpus)
    byId.keys.filter(_ < 100000L)
      .exists(id => id % EmbedSim.SemBenchMod == 0) shouldBe false
  }
}
