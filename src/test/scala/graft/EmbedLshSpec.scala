package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{EmbedLsh, EmbedSim}

/** Random-hyperplane LSH near-dup path: recall on the injected dups, the
  * high-similarity guarantee (every reported pair really is >= threshold),
  * the bucket-size cap, and the no-cartesian plan shape.
  */
class EmbedLshSpec extends AnyFunSuite with Matchers with TestSpark {

  test("recovers the injected near-dups at sf0.01 (deterministic recall)") {
    val out = EmbedLsh.embedDupsLsh(spark, "/root/testdata/sf0.01").cache()
    val injected = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .filter(col("vec_id") % EmbedSim.DupMod === 0).count()
    val recovered = out
      .filter(col("vec_b") === col("vec_a") + 100000).count()
    injected shouldBe 20
    // deterministic: fixed hyperplanes + fixed data. Expected-1-of-6-band
    // collision prob at cos ~0.93 is ~0.95; the IVF path's documented
    // recall on the same corpus is 18/20.
    recovered shouldBe 20
    // every reported pair genuinely clears the exact-cosine threshold
    out.filter(col("cos_sim") < EmbedSim.DupThreshold).count() shouldBe 0
    out.unpersist()
  }

  test("agrees with the IVF path on the pairs both candidate sets contain") {
    val dir = "/root/testdata/sf0.001"
    val lsh = EmbedLsh.embedDupsLsh(spark, dir)
    val ivf = EmbedSim.embedDupsOf(EmbedSim.dupAssigned(spark, dir))
    // same corpus, same threshold, same rounding: any pair found by BOTH
    // candidate generators must carry the identical cosine
    val joined = lsh.as("l").join(ivf.as("i"), Seq("vec_a", "vec_b"))
      .select(col("l.cos_sim").as("lc"), col("i.cos_sim").as("ic"))
      .collect()
    joined.length should be >= 1
    joined.foreach(r => r.getDouble(0) shouldBe r.getDouble(1))
  }

  test("adaptive band geometry: integer width rule, small-n fixed point") {
    // sf0.001/sf0.01 corpora (52 / 520 rows) use the historical 6x6
    EmbedLsh.bandBits(52) shouldBe 6
    EmbedLsh.bandBits(520) shouldBe 6
    EmbedLsh.bandsFor(6) shouldBe 6
    // boundary is exact: 2^6 * 16 = 1024
    EmbedLsh.bandBits(1024) shouldBe 6
    EmbedLsh.bandBits(1025) shouldBe 7
    // sf1 corpus (20.8k) gets 11-bit bands; recall formula widens to 15
    EmbedLsh.bandBits(20800) shouldBe 11
    EmbedLsh.bandsFor(11) shouldBe 15
    // wider bands never reduce the band count (recall is monotone in w)
    EmbedLsh.bandTable.sliding(2).foreach {
      case Seq((_, b1), (_, b2)) => b2 should be >= b1
      case _ => ()
    }
  }

  test("bucket cap drops oversized buckets (pairs bounded, drop observed)") {
    import spark.implicits._
    // 20 identical vectors: every band bucket has size 20 -> with a cap of
    // 10 every bucket is dropped and no pairs survive
    val v = Array.fill(EmbedLsh.Dim)(0.3)
    val corpus = (0L until 20L).map(i => (i, v)).toDF("vec_id", "emb")
    val sigs = corpus.select(col("vec_id"),
      EmbedLsh.bucketCols(col("emb")).as("buckets"))
    EmbedLsh.candidatePairs(sigs, maxBucket = 10).count() shouldBe 0L
    EmbedLsh.candidatePairs(sigs, maxBucket = 30).count() shouldBe
      20L * 19L / 2L
  }

  test("plan shape: no cartesian product anywhere") {
    val plan = EmbedLsh.embedDupsLsh(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
  }
}
