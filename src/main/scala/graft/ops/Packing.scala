package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextHash.words

/** Sequence packing: the concat-and-chop mapping from documents to
  * fixed-length training sequences that ends every LLM data pipeline.
  * Documents are concatenated in deterministic (source, doc_id) order and
  * chopped every [[SeqLen]] tokens; a document spans the sequences
  * [seq_first, seq_last] that its token interval overlaps (the standard
  * packing-with-concatenation scheme — documents may cross sequence
  * boundaries; attention masking at training time handles the joins).
  *
  * Scale shape — a TWO-PHASE DISTRIBUTED PREFIX SUM, not a per-source
  * running-sum window (which would put a source's ENTIRE token stream
  * through one task: at 100 TB one source is terabytes through one core):
  *
  *   1. range-partition by (source, doc_id) — every physical partition
  *      holds a contiguous slice of the semantic order;
  *   2. the running sum runs per (partition, source) GROUP — thousands of
  *      bounded parallel window groups instead of one unbounded group per
  *      source;
  *   3. per-(partition, source) token subtotals are a TINY frame (one row
  *      per partition x overlapping source); their per-source cumulative
  *      sum over partition order gives each group's base offset;
  *   4. the bases broadcast-join back onto the big side:
  *      start = group base + within-group running sum.
  *
  * Big-side cost: one range exchange + one hash exchange (the group
  * window) + a broadcast join — every task bounded by partition size
  * regardless of how skewed the corpus is across sources.
  */
object Packing {

  val SeqLen = 512

  /** Per-doc packing assignment: whitespace-token count, the doc's start
    * offset in its source's concatenated token stream, and the first/last
    * sequence index it occupies. Empty docs occupy their start sequence
    * trivially.
    *
    * @param parts range partitions for the prefix sum; 0 = the session's
    *              shuffle parallelism
    */
  /** Whitespace token count — the default packing tokenizer. */
  val WsTokens: Column => Column = c => size(words(c)).cast("long")

  /** @param tokenizer token-count column over the text — defaults to the
    *                  whitespace count; pass
    *                  [[graft.functions.BpeTokenCount]] to chop at REAL
    *                  trained-BPE token boundaries (q_seq_pack_bpe)
    */
  def seqPack(docs: DataFrame, seqLen: Int = SeqLen,
      parts: Int = 0, tokenizer: Column => Column = WsTokens): DataFrame = {
    val n = if (parts > 0) parts
      else docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // phase 1: contiguous slices of the (source, doc_id) order
    val ranged = docs
      .select(col("doc_id"), col("source"),
        tokenizer(col("text")).as("n_tokens"))
      .repartitionByRange(n, col("source"), col("doc_id"))
      .withColumn("_pid", spark_partition_id())
    // phase 2a: within-group running sum — groups bounded by partition size
    val wLocal = Window.partitionBy(col("_pid"), col("source"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("_local_before",
      coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
    // phase 2b: tiny subtotal frame -> per-source cumulative base offsets.
    // (The serial window here is over #partitions rows, not the corpus.)
    val wBase = Window.partitionBy(col("source")).orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = ranged.groupBy(col("_pid"), col("source"))
      .agg(sum(col("n_tokens")).as("_ptotal"))
      .withColumn("_base", coalesce(sum(col("_ptotal")).over(wBase), lit(0L)))
      .select(col("_pid"), col("source"), col("_base"))
    // phase 3: base + local offset, broadcast onto the big side. Both
    // branches contain the SAME canonical range exchange, which AQE's
    // stage cache materializes once and reuses — so the _pid assignment is
    // identical on both sides. Left join + raise_error guards the
    // theoretical case of divergent boundaries (e.g. exchange reuse
    // disabled): a missing base must fail loudly, never drop rows.
    local.join(broadcast(bases), Seq("_pid", "source"), "left")
      .withColumn("_base", when(col("_base").isNull,
        raise_error(lit("seqPack: range boundaries diverged between the " +
          "prefix-sum branches"))).otherwise(col("_base")))
      .withColumn("start_tok", col("_base") + col("_local_before"))
      .withColumn("seq_first",
        floor(col("start_tok") / seqLen).cast("long"))
      .withColumn("seq_last",
        floor((col("start_tok") +
          greatest(col("n_tokens") - 1, lit(0L))) / seqLen).cast("long"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("start_tok"), col("seq_first"), col("seq_last"))
      .orderBy("source", "doc_id")
  }

  /** Training shards per output file set. */
  val ShardCount = 8

  /** Token-balanced shard assignment: every document lands in one of
    * [[ShardCount]] shards such that per-shard token totals stay close —
    * the shard-creation step of a sharded training-data layout (N tar /
    * parquet shards consumed round-robin by data-loader workers; a token-
    * imbalanced shard set makes the slowest loader the epoch's critical
    * path).
    *
    * Assignment rule: global rank by (bpe_tokens DESC, doc_id), then
    * BOUSTROPHEDON (snake) placement — rank r sits in shard `r mod N` on
    * even passes and `N-1 - (r mod N)` on odd passes, so each consecutive
    * size-sorted pass of N documents is dealt out in alternating
    * direction and systematic drift cancels pairwise. The classic greedy
    * LPT ("next doc to the currently-lightest shard") balances slightly
    * tighter but is INHERENTLY SEQUENTIAL — each decision depends on all
    * previous totals — while the snake rule is pure arithmetic on the
    * global rank, which [[Ranked.perKey]] computes as a two-phase
    * distributed prefix sum: no corpus funnels through one task, and the
    * imbalance bound (max-min per-shard total <= the largest document's
    * tokens per completed pass pair, observed far tighter) is what a
    * data-loader actually needs.
    *
    * Scale shape: one codegen'd token-count scan, the two exchanges of
    * the distributed rank (range + the bounded per-(partition, key)
    * window), a broadcast base join, then pure per-row arithmetic.
    */
  def shardPack(docs: DataFrame, shards: Int = ShardCount,
      tokenizer: Column => Column = WsTokens): DataFrame = {
    val toks = Par.fanOut(docs).select(col("doc_id"),
      tokenizer(col("text")).as("n_tokens"))
      // the rank key is a constant: shardPack ranks the WHOLE corpus —
      // Ranked.perKey's two-phase shape is exactly the distributed form
      // of a global row_number
      .withColumn("_all", lit(1))
    val ranked = Ranked.perKey(toks, "_all",
      Seq(col("n_tokens").desc, col("doc_id").asc))
    val pass = floor(col("_rank0") / shards)
    val pos = col("_rank0") % shards
    ranked.select(col("doc_id"), col("n_tokens"),
        when(pass % 2 === 0, pos).otherwise(lit(shards - 1) - pos)
          .cast("long").as("shard"))
      .orderBy("doc_id")
  }
}
