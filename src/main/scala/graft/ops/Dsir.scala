package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextHash.{h56, words}

/** DSIR-style data selection: hashed n-gram importance weights + a
  * deterministic importance-resampling pass (Xie et al., "Data Selection
  * for Language Models via Importance Resampling", NeurIPS 2023 — the
  * pretraining-curation pattern where a small in-domain TARGET corpus
  * re-weights a huge RAW crawl).
  *
  * Exact-arithmetic variant (same policy as bm25's rational idf): the
  * per-doc weight is the rational target-affinity ratio
  * `Σ p_cnt[bucket(g)] / Σ q_cnt[bucket(g)]` over the doc's gram
  * occurrences — integer sums and ONE double division (both operands
  * < 2^53, so the quotient is IEEE-bit-identical cross-engine) — rather
  * than the paper's log-likelihood product, whose per-gram `ln` calls
  * would diverge in the last ulp between JVM and libm. Monotone in the
  * same direction: docs whose grams concentrate in target-heavy buckets
  * score high.
  *
  * The resampling draw is the engine's standard deterministic uniform
  * (md5-residue of doc_id, as in Sampling.mixedSample): keep iff
  * u < min(1, score). Pure function of (doc_id, corpus) — reruns,
  * repartitions, and incremental re-curation reproduce the keep set.
  *
  * Scale shape (100 TB): one gram explode feeds a 4096-bucket partial-agg
  * groupBy (the p/q count table — bounded, always broadcastable), the
  * same explode re-joins that broadcast table and collapses with ONE
  * per-doc partial-agg groupBy; the left join back to the corpus rides
  * the doc_id hash partitioning. No corpus-sized side ever broadcasts.
  */
object Dsir {

  /** Hash buckets for the n-gram feature space (paper default 10k; 4096
    * keeps the table broadcast-trivial and collision behavior identical
    * cross-engine via pmod(h56)).
    */
  val Buckets = 4096

  val KeepSalt = "dsir:v1:"

  /** Unigrams + bigrams of the lowered whitespace words, WITH
    * multiplicity (importance weights count occurrences, unlike the
    * dedup family's distinct shingles).
    */
  private def grams(w: Column): Column =
    concat(w,
      when(size(w) >= 2,
        transform(sequence(lit(0), size(w) - 2),
          i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2))))
        .otherwise(array()))

  /** Per-doc importance: target_hits / corpus_hits sums, the rational
    * score, and the resampling verdict. `isTarget` marks the in-domain
    * subset (rows stay in the raw corpus — DSIR's target is a lens, not
    * a partition).
    */
  def importance(docs: DataFrame, isTarget: Column): DataFrame = {
    // gram hashing runs native (ShingleHashes: unigrams ++ bigrams,
    // byte-identical h56 to the declarative grams()+md5 chain the
    // equivalence spec pins) — this subtree executes TWICE (bucket
    // table + per-doc collapse, no shared exchange), and the
    // per-gram string materialization was the measured onset of
    // super-linear GC at sf5 (SCALING.md §sf5)
    val g = Par.fanOut(docs)
      .select(col("doc_id"), isTarget.as("_t"),
        explode(concat(
          graft.functions.ShingleHashes(lower(col("text")), 1),
          graft.functions.ShingleHashes(lower(col("text")), 2))).as("_h"))
      .select(col("doc_id"), col("_t"),
        pmod(col("_h"), lit(Buckets.toLong)).as("bucket"))
    val table = g.groupBy("bucket")
      .agg(count(lit(1)).as("q_cnt"),
        sum(when(col("_t"), 1L).otherwise(0L)).as("p_cnt"))
    val sums = g.join(broadcast(table), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum(col("p_cnt")).as("target_hits"),
        sum(col("q_cnt")).as("corpus_hits"))
    val u = (conv(substring(
      md5(concat(lit(KeepSalt), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast("long") % 10000) / lit(10000.0)
    docs.select(col("doc_id"))
      .join(sums, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("target_hits"), lit(0L)).as("target_hits"),
        coalesce(col("corpus_hits"), lit(0L)).as("corpus_hits"))
      .withColumn("_score",
        when(col("corpus_hits") > 0,
          col("target_hits").cast("double") / col("corpus_hits"))
          .otherwise(lit(0.0)))
      .select(col("doc_id"), col("target_hits"), col("corpus_hits"),
        round(col("_score"), 6).as("score"),
        (u < least(lit(1.0), col("_score"))).as("kept"))
      .orderBy("doc_id")
  }
}
