package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.ops.{EmbedPq, EmbedSim}

/** Product-quantization index + ADC search: codebook/code structure
  * invariants and retrieval quality against the exact brute-force
  * baseline (PQ is approximate — the contract is "close", pinned as a
  * recall floor, not equality).
  */
class PqSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  test("codebooks: M subspaces, <= K entries each, SubDim-wide entries") {
    val cb = EmbedPq.pqCodebooks(spark, dir)
    val bad = cb.filter(
      org.apache.spark.sql.functions.size(col("cemb")) =!= EmbedPq.SubDim)
      .count()
    bad shouldBe 0L
    val perSub = cb.groupBy("m").count().collect()
    perSub.length shouldBe EmbedPq.SubSpaces
    all(perSub.map(_.getLong(1))) should be <= EmbedPq.CodebookK.toLong
    perSub.map(_.getLong(1)).foreach(_ should be >= 2L)
  }

  test("codes: every vector encodes to exactly M codes in [0, K)") {
    val cb = EmbedPq.pqCodebooks(spark, dir)
    val codes = EmbedPq.pqCodes(spark, dir, cb)
    val n = Tables.load(spark, dir, "embeddings").count()
    codes.count() shouldBe n * EmbedPq.SubSpaces
    codes.filter(col("code") < 0 ||
      col("code") >= EmbedPq.CodebookK).count() shouldBe 0L
    codes.groupBy("vec_id").count()
      .filter(col("count") =!= EmbedPq.SubSpaces).count() shouldBe 0L
  }

  test("IVF-PQ: subset-of-probed-lists contract + recall floor") {
    val ivfpq = EmbedPq.knnIvfPq(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val exact = EmbedSim.knnBrute(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val nQ = exact.select("query_id").distinct().count()
    val recall =
      ivfpq.intersect(exact).count().toDouble / (nQ * EmbedSim.TopK)
    info(s"IVF-PQ recall@10 vs exact brute force = $recall")
    // the coarse probe prunes candidates, so IVF-PQ recall is bounded by
    // the probed lists' true-neighbor coverage (ProbeCurveSpec measures
    // the ceiling: 0.96 at the escalated IvfPqProbes = 6); the floor
    // leaves room for the measured ~0.04 ADC quantization loss
    recall should be >= 0.9
    ivfpq.groupBy("query_id").count()
      .agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
      .toInt should be <= EmbedSim.TopK
  }

  test("ADC top-10 recalls the exact top-10 above the floor") {
    val pq = EmbedPq.knnPq(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val exact = EmbedSim.knnBrute(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val nQ = exact.select("query_id").distinct().count()
    val hits = pq.intersect(exact).count()
    val recall = hits.toDouble / (nQ * EmbedSim.TopK)
    info(s"recall@10 vs exact brute force = $recall")
    withClue(s"recall@10 = $recall: ") { recall should be >= 0.8 }
    // per-query shape: exactly TopK ranked neighbors each
    pq.groupBy("query_id").count()
      .filter(col("count") =!= EmbedSim.TopK).count() shouldBe 0L
  }
}
