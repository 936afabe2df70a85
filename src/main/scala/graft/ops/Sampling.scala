package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextHash.words

/** Deterministic sampling, splitting, and budgeted corpus mixing — the
  * selection layer of a training-data pipeline. Everything is a pure
  * function of (doc_id, salt): re-running any stage on any cluster yields
  * the same split/sample, which is what makes ablations and incremental
  * re-curation reproducible. No RNG, no `rand()` (non-deterministic across
  * retries/partitionings), no driver-side state.
  *
  * Scale shape: split/sample assignment is a shuffle-free projection
  * (md5 + modulo per row); the mix allocation aggregates one tiny
  * per-source frame that broadcasts back onto the corpus — the corpus
  * itself is never shuffled.
  */
object Sampling {

  val SplitSalt = "split:v1:"
  val MixSalt = "mix:v1:"
  val TrainPct = 90
  val ValPct = 5 // test = the remaining 5

  /** Token budget for the default corpus mix (uniform per-source targets —
    * up-weighting rare sources and down-sampling dominant ones is the
    * standard mixing move; weights would multiply in here).
    */
  val MixBudgetTokens = 10000.0

  /** Stable 32-bit integer from md5(salt || doc_id) — the deterministic
    * "random" driving splits and samples. First 8 hex chars, so always
    * non-negative and identical to the oracle's
    * `('0x' || substr(md5(...), 1, 8))::BIGINT`.
    */
  private def h32(salt: String, id: Column): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8),
      16, 10).cast("long")

  /** Deterministic train/val/test split: bucket = h32 % 100, train < 90,
    * val < 95, test otherwise. Stable under reruns, re-partitioning, and
    * corpus growth (a doc's split never changes when other docs arrive —
    * unlike `rand()` or ntile splits).
    */
  def docSplit(docs: DataFrame): DataFrame =
    docs
      .withColumn("bucket", (h32(SplitSalt, col("doc_id")) % 100).cast("int"))
      .withColumn("split",
        when(col("bucket") < TrainPct, lit("train"))
          .when(col("bucket") < TrainPct + ValPct, lit("val"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy("doc_id")

  /** Per-source mix allocation under a whitespace-token budget: each
    * source gets an equal share of the budget, and `sample_frac` is the
    * fraction of that source's tokens to keep (capped at 1). The frac is
    * computed in plain IEEE double arithmetic (division + least) so the
    * sampling filter below is bit-identical in Spark and the oracle;
    * it is rounded to 6dp for DISPLAY only.
    */
  def corpusMix(docs: DataFrame,
      budget: Double = MixBudgetTokens,
      tokenizer: Column => Column = Packing.WsTokens): DataFrame =
    mixAllocation(docs, budget, tokenizer)
      .select(col("source"), col("n_docs"), col("total_tokens"),
        round(col("target_tokens"), 2).as("target_tokens"),
        round(col("sample_frac"), 6).as("sample_frac"))
      .orderBy("source")

  private def mixAllocation(docs: DataFrame, budget: Double,
      tokenizer: Column => Column = Packing.WsTokens): DataFrame = {
    val perSource = docs
      .select(col("source"), tokenizer(col("text")).as("_ws"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_ws")).cast("long").as("total_tokens"))
    val nSources = perSource.select(count(lit(1)).as("_n"))
    perSource.crossJoin(broadcast(nSources))
      .withColumn("target_tokens", lit(budget) / col("_n"))
      .withColumn("sample_frac",
        least(lit(1.0), col("target_tokens") / col("total_tokens")))
      .drop("_n")
  }

  /** The budgeted mixed sample itself: a doc is kept iff its per-source
    * deterministic fraction h32(mix)/10000 falls below the source's
    * allocation fraction. The tiny allocation frame broadcasts onto the
    * corpus — selection is one corpus scan, no corpus shuffle.
    */
  def mixedSample(docs: DataFrame,
      budget: Double = MixBudgetTokens): DataFrame = {
    val alloc = mixAllocation(docs, budget)
      .select(col("source"), col("sample_frac"))
    docs.join(broadcast(alloc), Seq("source"))
      .filter((h32(MixSalt, col("doc_id")) % 10000) / lit(10000.0) <
        col("sample_frac"))
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
  }

  val ReservoirSalt = "res:v1:"
  val ReservoirK = 10

  /** Deterministic per-group uniform sample without replacement — the
    * batch equivalent of a per-key reservoir: keep the k docs with the
    * SMALLEST md5 draw within each source. A hash-ranked sample is
    * uniform (md5 is uniform on doc_id), reproducible under reruns and
    * repartitioning, and — unlike rand()-based reservoirs — stable
    * per item as the corpus grows (a kept doc is only ever evicted by a
    * new smaller-hash arrival, the property incremental re-curation
    * needs).
    *
    * Runs through the custom bounded-heap [[graft.plans.TopK]] physical
    * operator: per-partition heaps prune to k BEFORE the single key
    * exchange, so a giant source ships k rows, not its population —
    * the same mega-group-safety argument as q_cluster_sample.
    */
  def reservoir(docs: DataFrame, k: Int = ReservoirK): DataFrame = {
    val drawn = docs.select(col("source"), col("doc_id"),
      h32(ReservoirSalt, col("doc_id")).as("draw"))
    graft.plans.TopK.perKey(drawn, Seq("source"),
        Seq(graft.plans.TopK.asc("draw"), graft.plans.TopK.asc("doc_id")), k)
      .select(col("source"), col("doc_id"), col("draw"))
      .orderBy("source", "draw", "doc_id")
  }

  val WeightedSalt = "wres:v1:"
  val WeightedK = ReservoirK

  /** Deterministic WEIGHTED sample without replacement (Efraimidis &
    * Spirakis 2006's exponential-key A-ES, hash-derandomized): per doc
    * draw u = (h32+1)/2^32 ∈ (0,1], key = ln(u)/w with w = whitespace
    * token count (>= 1), and the k LARGEST keys per source win —
    * inclusion probability proportional to w, which is the right
    * selection rule when a TOKEN budget (not a doc count) is being
    * filled: a 10k-token doc and ten 1k-token docs cost the budget the
    * same, so they should carry the same selection mass. ln(u)/w is the
    * log of the textbook u^(1/w) key — same order, no pow, and the
    * only transcendental (ln of an exact dyadic rational) feeds a
    * 6dp-quantized display column while RANKING uses the raw double
    * (adjacent order-statistic gaps at any real corpus size are ~1e-5,
    * ten orders above ulp drift).
    *
    * Same scale shape as [[reservoir]]: per-partition bounded heaps via
    * the custom TopK physical operator prune to k BEFORE the single key
    * exchange — a giant source ships k rows, not its population.
    */
  def weightedSample(docs: DataFrame, k: Int = WeightedK): DataFrame = {
    val u = (h32(WeightedSalt, col("doc_id")) + lit(1L)) /
      lit(4294967296.0)
    val drawn = docs.select(col("source"), col("doc_id"),
        greatest(lit(1L), Packing.WsTokens(col("text"))).as("weight"),
        log(u).as("_lnu"))
      .withColumn("_k", col("_lnu") / col("weight"))
    graft.plans.TopK.perKey(drawn, Seq("source"),
        Seq(graft.plans.TopK.desc("_k"), graft.plans.TopK.asc("doc_id")), k)
      .select(col("source"), col("doc_id"), col("weight"),
        round(col("_k"), 6).as("es_key"))
      .orderBy("source", "doc_id")
  }
}
