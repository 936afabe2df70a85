package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared scale shape of the perceptual (cross-modal) near-dup tiers:
  * banded hamming buckets over a 64-bit per-item fingerprint, capped
  * in-bucket pairing, exact `bit_count(xor)` verification — one
  * implementation behind [[ImageDedup.imageDups]] and
  * [[AudioDedup.audioDups]], so the image and audio modalities cannot
  * drift apart structurally. The banding math is
  * [[TextDedup.simhashDups]]'s: disjoint equal-width bands pigeonhole-
  * guarantee a shared band for hamming <= bands-1, and the bucket cap
  * is the stop-sign against quadratic blowup on degenerate banks
  * (near-black thumbnails, silence-padded clips).
  */
object Perceptual {

  /** Pairs (a, b, hamming) with a < b and hamming <= maxHamming, from a
    * skinny (id, h) frame. `hashes` MUST already be persisted by the
    * caller (it is consumed three times: bucketing + both verify sides)
    * — each modality persists its own projection so the expensive
    * decode runs once and payloads never pass this point.
    */
  private[ops] def bandedDups(hashes: DataFrame, idCol: String,
      bands: Int, bandBits: Int, maxHamming: Int,
      outA: String, outB: String): DataFrame = {
    val fanout = hashes.sparkSession.sessionState.conf.numShufflePartitions
    val mask = (1L << bandBits) - 1L
    val buckets = hashes
      .select(col(idCol),
        explode(sequence(lit(0), lit(bands - 1))).as("i"), col("h"))
      .withColumn("bv",
        call_function("shiftright", col("h"), col("i") * lit(bandBits))
          .bitwiseAND(lit(mask)))
      // pin the bucket exchange width (AQE would coalesce the tiny-BYTES
      // band rows to one partition and serialize the pair explode —
      // same rationale as simhashDups)
      .repartition(fanout, col("i"), col("bv"))
      .groupBy(col("i"), col("bv"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
    val pairs = TextDedup.suffixPairs(buckets, TextDedup.MaxBucket)
      .withColumnRenamed("doc_a", outA)
      .withColumnRenamed("doc_b", outB)
    val hOf = hashes.select(col(idCol), col("h"))
    pairs
      .join(hOf.as("ha"), col(outA) === col(s"ha.$idCol"))
      .join(hOf.as("hb"), col(outB) === col(s"hb.$idCol"))
      .withColumn("hamming",
        bit_count(col("ha.h").bitwiseXOR(col("hb.h"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col(outA), col(outB), col("hamming"))
      .orderBy(outA, outB)
  }
}
