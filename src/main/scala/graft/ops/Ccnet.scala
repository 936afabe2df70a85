package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style perplexity terciles: per source, documents are sorted by
  * LM predictability and split head / middle / tail — the classic
  * quality stratification (Wenzek et al. 2020 order Common Crawl by
  * KenLM perplexity per language and keep the head; here the score is
  * [[TextAnalysis.lmScore]]'s exact-arithmetic bigram predictability,
  * high = predictable = head, and the grouping key is `source`).
  *
  * The split is EXACT ntile(3) semantics (first n mod 3 buckets take the
  * extra rows), but computed WITHOUT a per-source window: the global
  * per-source position comes from [[Ranked.perKey]]'s two-phase prefix
  * sum, so no source's corpus ever funnels through one task — the
  * standard ntile-over-partition formulation dies exactly there at
  * 100 TB (one web-crawl source IS the corpus).
  */
object Ccnet {

  val NBuckets = 3

  private val BucketNames = Seq("head", "middle", "tail")

  /** Per-document tercile assignment: (doc_id, source, avg_condp,
    * bucket). Deterministic total order: (avg_condp DESC, doc_id) within
    * source; the score is already 6dp-quantized by lmScore, so the
    * cross-engine tie set is exact.
    */
  def buckets(docs: DataFrame,
      salts: Int = TextAnalysis.TokenSalts): DataFrame = {
    val lm = TextAnalysis.lmScoreCols(docs, salts, Seq("source"))
      .select(col("doc_id"), col("source"), col("avg_condp"))
    val ranked = Ranked.perKey(lm, "source",
      Seq(col("avg_condp").desc, col("doc_id").asc))
    // exact ntile arithmetic from (rank, group size): with n rows and k
    // buckets, the first n mod k buckets hold floor(n/k) + 1 rows
    val k = lit(NBuckets.toLong)
    val small = floor(col("_nkey") / k)
    val big = col("_nkey") % k
    val thr = big * (small + 1)
    val b0 = when(col("_rank0") < thr, floor(col("_rank0") / (small + 1)))
      .otherwise(big + floor((col("_rank0") - thr) /
        greatest(small, lit(1L))))
    val bucket = BucketNames.zipWithIndex.tail.foldLeft(
        when(b0 === 0, BucketNames.head)) { case (w, (n, i)) =>
      if (i < BucketNames.size - 1) w.when(b0 === i, n) else w.otherwise(n)
    }
    ranked.select(col("doc_id"), col("source"), col("avg_condp"),
        bucket.as("bucket"))
      .orderBy("source", "doc_id")
  }
}
