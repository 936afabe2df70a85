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

  /** Incremental perceptual near-dup: a NEW batch of fingerprints
    * against the STANDING hash index, without touching index-vs-index
    * pairs — the daily-ingest path of a production media-dedup service,
    * the exact [[TextDedup.incrementalDups]] contract over hamming
    * bands instead of MinHash bands. `hashes` is one (id, h) frame
    * (typically an [[graft.IndexStore]] merge of the standing index
    * plus today's batch); rows with id >= newIdBase are the increment.
    *
    * Scale shape: the increment's band keys join the index's band
    * table — shuffle volume proportional to the INCREMENT, never the
    * corpus (at 100 TB the index bands are a standing bucketed table
    * and this join co-locates on it; a small-enough increment
    * broadcasts). The hot-band cap is decided on the INDEX side alone —
    * the standing index already knows its degenerate banks (black
    * frames, silence), so a pathological increment cannot re-admit a
    * banned bucket. Verification is exact bit_count(xor) on candidates
    * only.
    */
  private[ops] def bandedDupsIncremental(hashes: DataFrame, idCol: String,
      bands: Int, bandBits: Int, maxHamming: Int, newIdBase: Long,
      outIdx: String, outNew: String): DataFrame = {
    val fanout = hashes.sparkSession.sessionState.conf.numShufflePartitions
    val mask = (1L << bandBits) - 1L
    def bandsOf(df: DataFrame) = df
      .select(col(idCol),
        explode(sequence(lit(0), lit(bands - 1))).as("i"), col("h"))
      .withColumn("bv",
        call_function("shiftright", col("h"), col("i") * lit(bandBits))
          .bitwiseAND(lit(mask)))
      .select(col(idCol), col("i"), col("bv"))
    val index = hashes.filter(col(idCol) < newIdBase)
    val fresh = hashes.filter(col(idCol) >= newIdBase)
    val okBands = bandsOf(index)
      .repartition(fanout, col("i"), col("bv"))
      .groupBy(col("i"), col("bv"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= TextDedup.MaxBucket)
      .select(col("i"), col("bv"))
    val cand = bandsOf(fresh).as("f")
      .join(bandsOf(index).join(okBands, Seq("i", "bv")).as("ix"),
        Seq("i", "bv"))
      .select(col(s"ix.$idCol").as(outIdx), col(s"f.$idCol").as(outNew))
      .distinct()
    val hOf = hashes.select(col(idCol), col("h"))
    cand
      .join(hOf.as("ha"), col(outIdx) === col(s"ha.$idCol"))
      .join(hOf.as("hb"), col(outNew) === col(s"hb.$idCol"))
      .withColumn("hamming",
        bit_count(col("ha.h").bitwiseXOR(col("hb.h"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col(outIdx), col(outNew), col("hamming"))
      .orderBy(outIdx, outNew)
  }
}
