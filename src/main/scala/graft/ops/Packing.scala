package graft.ops

import org.apache.spark.sql.DataFrame
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
  * Packing is PER SOURCE (= per shard): a single global running sum would
  * serialize the whole corpus through one partition at 100 TB, while
  * per-shard packing is how production pipelines run anyway (each shard's
  * sequences are independent). One shuffle: the per-source window.
  */
object Packing {

  val SeqLen = 512

  /** Per-doc packing assignment: whitespace-token count, the doc's start
    * offset in its source's concatenated token stream, and the first/last
    * sequence index it occupies. Empty docs occupy their start sequence
    * trivially.
    */
  def seqPack(docs: DataFrame, seqLen: Int = SeqLen): DataFrame = {
    val before = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), col("source"),
        size(words(col("text"))).cast("long").as("n_tokens"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(before), lit(0L)))
      .withColumn("seq_first",
        floor(col("start_tok") / seqLen).cast("long"))
      .withColumn("seq_last",
        floor((col("start_tok") +
          greatest(col("n_tokens") - 1, lit(0L))) / seqLen).cast("long"))
      .orderBy("source", "doc_id")
  }
}
