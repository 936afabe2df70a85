package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic corpora for the dedup/similarity operators. The driver's
  * `documents` table has no duplicates, so — exactly like graft.ops.Reviews
  * derives dirty reviews — we derive corpora with KNOWN duplicate structure
  * from `doc_id` arithmetic. The identical construction lives in the DuckDB
  * oracle (graft.oracle.SqlText.*Cte), so both engines see the same rows.
  */
object Corpus {

  /** documents + EXACT duplicates: every doc_id % 11 == 0 is repeated
    * verbatim under doc_id + 100000.
    */
  def withExactDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "source")
    docs.unionAll(
      docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"),
          col("source")))
  }

  /** The shared boilerplate span [[withBoilerplate]] injects — 12 words,
    * longer than [[TextDedup.SubstrGram]], so every pure-boilerplate
    * K-window repeats corpus-wide while the windows straddling its edges
    * stay document-unique.
    */
  val Boilerplate: Seq[String] =
    ("subscribe to our newsletter for the latest updates " +
      "terms of service apply").split(" ").toSeq

  /** documents with a VERBATIM boilerplate span spliced into every
    * doc_id % 10 == 0 document at a word offset that varies per doc
    * (doc_id % 7 + 1) — deliberately NOT aligned to any chunk grid, so
    * chunk-level dedup ([[TextDedup.chunkDedup]]) cannot see the repeat
    * but sliding-window substring dedup ([[TextDedup.substringDedup]])
    * must. Injected docs are rebuilt from their (lowered) word array;
    * others pass through untouched. Mirrored in
    * [[graft.oracle.SqlText.substringDedup]].
    */
  def withBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val w = TextHash.words(col("text"))
    val off = (col("doc_id") % 7 + 1).cast("int")
    val bp = array(Boilerplate.map(lit): _*)
    docs.select(col("doc_id"),
      when(col("doc_id") % 10 === 0,
        concat_ws(" ",
          concat(slice(w, lit(1), off), bp,
            slice(w, off + 1, greatest(size(w) - off, lit(0))))))
        .otherwise(col("text")).as("text"))
  }

  /** The substring-dedup increment ("today's crawl" for the sliding-
    * window tier): every doc_id % 9 == 0 document RE-CRAWLED under
    * doc_id + 200000 with the boilerplate spliced at a FIXED offset 3 —
    * its text repeats the standing copy's token stream nearly verbatim
    * (plus the corpus-wide boilerplate span), so almost every window
    * should lose to the standing gram index; and every doc_id % 9 == 3
    * document re-issued REVERSED under doc_id + 300000 — same vocabulary,
    * but no >= K-token run of the reversed sequence appears anywhere in
    * the standing corpus, so it must survive intact. Mirrored in
    * [[graft.oracle.SqlText.substringDedupIncr]].
    */
  def substrIncrement(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val w = TextHash.words(col("text"))
    val bp = array(Boilerplate.map(lit): _*)
    val recrawl = docs.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat_ws(" ", concat(slice(w, lit(1), lit(3)), bp,
          slice(w, lit(4), greatest(size(w) - 3, lit(0))))).as("text"))
    val fresh = docs.filter(col("doc_id") % 9 === 3)
      .select((col("doc_id") + 300000).as("doc_id"),
        concat_ws(" ", reverse(w)).as("text"))
    recrawl.unionAll(fresh)
  }

  /** The NEW-batch half of the near-dup corpus alone: every doc_id % 13
    * == 0 document repeated under doc_id + 100000 with its last word
    * removed — "today's crawl contains near-copies of already-indexed
    * docs". [[withNearDups]] = documents ∪ this, and the increment-merge
    * index path ([[graft.IndexStore.mergeOrBuild]]) signs and indexes the
    * two halves separately.
    */
  def nearDupIncrement(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "source")
      .filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        regexp_replace(col("text"), """\s+\S+\s*$""", "").as("text"),
        col("source"))

  /** documents + NEAR duplicates: every doc_id % 13 == 0 is repeated under
    * doc_id + 100000 with its last word removed.
    */
  def withNearDups(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "source")
      .unionAll(nearDupIncrement(spark, dir))

  /** documents + EXCERPT copies: every doc_id % 9 == 0 document is
    * repeated under doc_id + 200000 keeping only its first
    * max(ShingleK+1, ⌊3·len/5⌋) words — "a quote/extract of an indexed
    * document re-appears as its own document". The excerpt's shingle set
    * is a strict SUBSET of the original's, which is the asymmetric
    * relation [[TextDedup.containmentPairs]] exists to catch (symmetric
    * Jaccard dilutes it by the length ratio). Integer-only length
    * arithmetic (3·len then floor-div 5 — `3*n/5.0` is exact-enough in
    * IEEE double that floor never straddles, and the oracle mirrors it
    * verbatim).
    */
  def withExcerpts(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "source")
    val w = TextHash.words(col("text"))
    val keep = greatest(lit(TextDedup.ShingleK + 1),
      floor(size(w) * 3 / lit(5)).cast("int"))
    docs.unionAll(
      docs.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat_ws(" ", slice(w, lit(1), keep)).as("text"),
          col("source")))
  }
}
