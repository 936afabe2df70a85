package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.EmbedSim

/** Semantic clustering surface (q_kmeans): trained-centroid assignment +
  * cluster populations, consistent with the IVF index the KNN path probes.
  */
class KmeansSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  test("every vector gets exactly one cluster; sizes are consistent") {
    val out = EmbedSim.kmeansAssign(spark, dir).collect()
    val n = Tables.load(spark, dir, "embeddings").count()
    out.length shouldBe n
    out.map(_.getLong(0)).distinct.length shouldBe n
    // per-cluster size column = the actual count of members
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (_, rows) =>
      rows.map(_.getLong(2)).distinct.toSeq shouldBe Seq(rows.length.toLong)
    }
    // more than one cluster, and the partition covers the corpus exactly
    byCluster.size should be > 1
    byCluster.values.map(_.length.toLong).sum shouldBe n
  }

  test("assignment agrees with a prebuilt index (memoized-path parity)") {
    val idx = EmbedSim.ivfCentroids(spark, dir)
    val a = EmbedSim.kmeansAssign(spark, dir).collect().toSeq
    val b = EmbedSim.kmeansAssign(spark, dir, Some(idx)).collect().toSeq
    a shouldBe b
  }
}
