package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.{TextAnalysis, TextDedup}

/** Streaming ingest gate: benchmark decontamination + Gopher quality
  * rules applied to a document firehose ON ARRIVAL, before anything is
  * admitted to the corpus — the streaming analogue of the reference's
  * quality gate on a review stream (`/root/reference/streaming/
  * faust_app.py:95-170` validates/routes every record as it arrives; here
  * the per-record checks are corpus-curation ones). Both checks are
  * STATELESS scans: the Gopher rules are per-row column expressions, and
  * decontamination is per-doc once the (static, small) benchmark gram
  * frame is broadcast — so the gate carries NO streaming state, no
  * watermark, and survives any micro-batch slicing with verdicts
  * identical to one batch pass, which is what the parity spec pins.
  *
  * Scale shape (100 TB firehose): per micro-batch the corpus side is one
  * scan of the arriving rows; the benchmark gram set is computed ONCE,
  * cached, and broadcast into every batch's hash join (Spark re-plans
  * the stream-side per micro-batch, so the cached static frame is the
  * idiom for "don't re-derive the dimension every trigger"). Nothing
  * accumulates: state size is zero regardless of stream history.
  */
object StreamGate {

  /** Gopher-style quality rules on a live stream — EXACTLY the batch
    * expressions ([[TextAnalysis.gopherColumns]] is the shared body; the
    * batch entry adds only the oracle-determinism sort). Legal in append
    * mode with no watermark: one codegen'd projection, no state.
    */
  def gopherStream(docs: DataFrame): DataFrame =
    TextAnalysis.gopherColumns(docs)

  /** A reusable decontamination context: the benchmark's distinct gram
    * frame, derived once and cached, so every micro-batch's broadcast
    * hash join builds from the same materialized rows instead of
    * re-shingling the benchmark per trigger.
    */
  final class BenchmarkGrams private[StreamGate] (
      private[StreamGate] val grams: DataFrame,
      private[StreamGate] val ids: DataFrame,
      private[StreamGate] val k: Int) {
    def unpersist(): Unit = { grams.unpersist(); ids.unpersist() }
  }

  /** Build (and cache) the benchmark gram set for [[decontaminateStream]].
    * `benchmark` must be a STATIC frame — eval suites are files, not
    * streams; the gate's exactly-one-derivation contract hangs on that.
    */
  def benchmarkGrams(benchmark: DataFrame,
      k: Int = TextDedup.ContamGram): BenchmarkGrams = {
    require(!benchmark.isStreaming,
      "the benchmark side of a decontamination gate must be static")
    val grams = TextDedup.benchGramSet(benchmark, k).cache()
    val ids = benchmark.select(col("doc_id").as("_bid")).cache()
    grams.count(); ids.count() // materialize once, before the first trigger
    new BenchmarkGrams(grams, ids, k)
  }

  /** The production gate: one streaming sink that, per micro-batch, runs
    * the EXACT batch operators — [[TextDedup.decontaminate]] (broadcast
    * benchmark gram join, per-doc shared-gram counts) and
    * [[TextAnalysis.gopherColumns]] — over the arriving rows and hands
    * the caller one annotated frame per batch: every arriving doc_id with
    * its `n_shared_grams` (0 = clean) and its Gopher verdict columns.
    *
    * Batch parity is STRUCTURAL, not re-implemented: decontaminate and
    * the Gopher rules are per-doc given the static benchmark, every doc
    * lives in exactly one micro-batch, so the concatenation of per-batch
    * outputs equals one batch pass over the union — the parity spec
    * (`StreamGateSpec`) checks value identity across a 3-batch arrival
    * against the single-pass truth.
    */
  def gateSink(docs: DataFrame, bg: BenchmarkGrams)(
      handle: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], id: Long) =>
        val annotated = gateBatch(batch.toDF(), bg)
        handle(annotated, id)
    }

  /** One-shot batch form of the gate (registry / oracle entry): derives
    * the benchmark gram frame inline — no caching, since a single pass
    * reads it exactly once — and annotates every doc with its Gopher
    * verdict, shared-gram count, and the combined admit bit. Value-equal
    * to the streaming gate's per-batch union by the parity argument on
    * [[gateSink]].
    */
  def gate(docs: DataFrame, benchmark: DataFrame,
      k: Int = TextDedup.ContamGram): DataFrame =
    gateBatch(docs, new BenchmarkGrams(TextDedup.benchGramSet(benchmark, k),
      benchmark.select(col("doc_id").as("_bid")), k))

  /** The per-batch body of [[gateSink]] — also the batch-mode gate. */
  def gateBatch(batch: DataFrame, bg: BenchmarkGrams): DataFrame = {
    val contam = TextDedup.decontaminateAgainstGrams(
      batch, bg.grams, bg.ids, bg.k)
    TextAnalysis.gopherColumns(batch.select("doc_id", "text"))
      .join(contam, Seq("doc_id"), "left")
      .withColumn("n_shared_grams",
        coalesce(col("n_shared_grams"), lit(0L)))
      .withColumn("admit", col("keep") && col("n_shared_grams") === 0)
  }
}
