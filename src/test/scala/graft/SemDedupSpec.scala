package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.EmbedSim

/** SemDeDup pruning stage (q_semdedup): within-cluster near-dup losers are
  * dropped min-id-wins; verdicts must be consistent with the q_embed_dups
  * pair set (same corpus, same assignment, same threshold).
  */
class SemDedupSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  test("verdicts cover the perturbed corpus exactly once and drop " +
      "exactly the higher id of every near-dup pair") {
    val assigned = EmbedSim.dupAssigned(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val out = EmbedSim.semDedup(spark, dir, Some(assigned)).collect()
      val n = assigned.count()
      out.length shouldBe n
      out.map(_.getLong(0)).distinct.length shouldBe n

      // the drop set is exactly the set of vec_b's from the pair query
      val pairs = EmbedSim.embedDupsOf(assigned).collect()
      val losers = pairs.map(_.getLong(1)).toSet
      val dropped = out.filter(!_.getBoolean(2)).map(_.getLong(0)).toSet
      dropped shouldBe losers

      // the perturbed corpus has true near-dups, so pruning is non-trivial
      // yet never total
      dropped.size should be > 0
      dropped.size.toLong should be < n
      // every injected perturbed copy (vec_id >= 100000) whose base pair
      // survived candidate generation is a loser — its base keeps
      pairs.foreach { r =>
        r.getLong(0) should be < r.getLong(1)
      }
    } finally { assigned.unpersist(); () }
  }
}
