package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.EmbedSim

/** Within-cluster diversity sampling (q_cluster_sample): the k
  * farthest-from-centroid members per trained cluster, through the custom
  * bounded-heap TopK physical operator. Value-level truth is the DuckDB
  * oracle; this spec pins the structural contract against the kmeans
  * assignment surface.
  */
class ClusterSampleSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  test("per-cluster k cap, ordering, and assignment consistency " +
      "with kmeansAssign") {
    val idx = EmbedSim.ivfCentroids(spark, dir)
    val out = EmbedSim.clusterSample(spark, dir, Some(idx)).collect()
    val assign = EmbedSim.kmeansAssign(spark, dir, Some(idx)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // no vector sampled twice; each sampled row sits in its assigned cluster
    out.map(_.getLong(1)).distinct.length shouldBe out.length
    out.foreach { r =>
      assign(r.getLong(1))._1 shouldBe r.getLong(0)
    }

    val byCluster = out.groupBy(_.getLong(0))
    byCluster.foreach { case (cid, rows) =>
      rows.length should be <= EmbedSim.ClusterSampleK
      // clusters with >= k members yield exactly k; smaller ones, all
      val pop = assign.collectFirst {
        case (_, (c, size)) if c == cid => size
      }.get
      rows.length.toLong shouldBe math.min(pop, EmbedSim.ClusterSampleK.toLong)
      // ascending (cos_center, vec_id) within the cluster
      val key = rows.map(r => (r.getDouble(2), r.getLong(1))).toSeq
      key shouldBe key.sorted
    }
    // every cluster is represented (k >= 1 and every cluster is non-empty)
    byCluster.keySet shouldBe assign.values.map(_._1).toSet
  }
}
