package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{Corpus, TextDedup}

/** The capped, groupBy-bucketed LSH candidate generation must (a) produce
  * exactly the pairs of the classic exploded-self-join when no bucket
  * exceeds the cap, (b) drop oversized buckets — the straggler guard at
  * scale — while keeping small-bucket pairs, and (c) surface the drops via
  * the named observe metrics.
  */
class DedupCapSpec extends AnyFunSuite with Matchers with TestSpark {

  test("capped candidatePairs equals the self-join form on real data") {
    val sigs = TextDedup
      .signatures(Corpus.withNearDups(spark, "/root/testdata/sf0.001"))
      .select("doc_id", "bands")
    val bucketed = TextDedup.candidatePairs(sigs)
      .orderBy("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val exploded = sigs.select(col("doc_id"), explode(col("bands")).as("band"))
    val selfJoin = exploded.as("a")
      .join(exploded.as("b"), col("a.band") === col("b.band") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    bucketed.length should be > 0
    bucketed.toSeq shouldBe selfJoin.toSeq
  }

  test("oversized buckets are dropped and reported; small buckets survive") {
    import spark.implicits._
    val hotText = "the same boilerplate footer text repeated across the corpus"
    val coldText = "a genuinely unique pair of near duplicate review documents"
    val docs = (0L until 50L).map(i => (i, hotText)) ++
      Seq((100L, coldText), (101L, coldText))
    val sigs = TextDedup.signatures(
      docs.toDF("doc_id", "text").withColumn("source", lit("t")))
      .select("doc_id", "bands")

    val capped = TextDedup.candidatePairs(sigs, maxBucket = 10)
    val rows = capped.collect().map(r => (r.getLong(0), r.getLong(1)))
    // identical hot docs share all 8 band buckets (size 50 > cap: dropped);
    // the cold pair's buckets have size 2 and survive
    rows.toSeq shouldBe Seq((100L, 101L))

    val metrics = capped.queryExecution.observedMetrics("lsh_buckets")
    metrics.getAs[Long]("lsh_dropped_buckets") shouldBe 8L
    metrics.getAs[Int]("lsh_max_bucket") shouldBe 50

    // uncapped: the hot bucket contributes its quadratic pair set
    val uncapped = TextDedup.candidatePairs(sigs, maxBucket = 1000).count()
    uncapped shouldBe (50L * 49 / 2 + 1)
  }
}
