package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.EmbedSim

/** Incremental embedding ingest (q_embed_dups_incr): today's batch
  * against the standing IVF index — pairs must equal a full rebuild's
  * cross-boundary pairs under the SAME frozen centroids, every planted
  * perturbed copy must be found against its base, and no standing or
  * increment-internal pair may leak into the output.
  */
class EmbedIncrSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  test("incremental pairs equal the full-rebuild pair set restricted " +
      "to (index, increment) pairs under the same standing centroids") {
    val centroids = EmbedSim.ivfCentroids(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val incremental =
        EmbedSim.embedDupsIncremental(spark, dir, Some(centroids))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // full rebuild: assign standing ∪ increment to the SAME frozen
      // centroids, run the batch pair operator, keep boundary-crossing
      // pairs (vec_a < base <= vec_b under the operator's a<b order)
      val standing = EmbedSim.standingAssigned(spark, dir, centroids)
      val incr = EmbedSim.embedIncrement(spark, dir)
      val rebuilt = EmbedSim.embedDupsOf(
          standing.unionByName(EmbedSim.assignTo(incr, centroids)))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (a, b) =>
          a < EmbedSim.NewVecBase && b >= EmbedSim.NewVecBase
        }.toSet
      incremental shouldBe rebuilt
      standing.columns should contain("centroid_id")
    } finally { centroids.unpersist(); () }
  }

  test("every planted perturbed copy pairs with its base above the " +
      "threshold, and neither index-vs-index nor increment-vs-increment " +
      "pairs leak") {
    val pairs = EmbedSim.embedDupsIncremental(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    pairs should not be empty
    pairs.foreach { case (idx, nw, cos) =>
      idx should be < EmbedSim.NewVecBase
      nw should be >= EmbedSim.NewVecBase
      cos should be >= EmbedSim.DupThreshold
    }
    // the planted copies (base % DupMod == 0 → base + NewVecBase) are
    // near-identical to their base; each must surface against it
    val byNew = pairs.groupBy(_._2)
    pairs.map(_._2).distinct.foreach { nw =>
      byNew(nw).map(_._1) should contain(nw - EmbedSim.NewVecBase)
    }
  }

  test("incremental SemDeDup verdicts: one per arriving vector, drops " +
      "are exactly the standing-pair losers plus earlier-in-batch " +
      "losers, standing verdicts never re-open") {
    val verdicts = EmbedSim.semDedupIncremental(spark, dir)
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    val incrIds = EmbedSim.embedIncrement(spark, dir)
      .collect().map(_.getLong(0)).toSet
    // coverage: exactly the increment, once each — no standing verdicts
    verdicts.map(_._1).toSet shouldBe incrIds
    verdicts.length shouldBe incrIds.size
    verdicts.foreach(_._1 should be >= EmbedSim.NewVecBase)
    // every vector with a standing near-dup pair is dropped; kept
    // vectors appear in no pair
    val pairedNew = EmbedSim.embedDupsIncremental(spark, dir)
      .collect().map(_.getLong(1)).toSet
    val dropped = verdicts.filter(!_._2).map(_._1).toSet
    pairedNew.subsetOf(dropped) shouldBe true
    // drops beyond the standing pairs can only be in-batch min-id
    // losers — and there is at least one planted drop overall
    dropped should not be empty
    (dropped -- pairedNew).foreach { id =>
      id should be >= EmbedSim.NewVecBase
    }
  }
}
