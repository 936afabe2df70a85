package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.BpeTokenCount
import graft.ops.TextHash
import graft.rules.Bpe
import graft.tools.TrainBpe

/** The frozen trained-merges BPE tokenizer: hand-pinned encodings,
  * trainer/encoder consistency, structural bounds, and the expression ==
  * per-word-sum identity (cross-ENGINE identity is the DuckDB oracle's
  * job — q_bpe_tokens / q_seq_pack_bpe / q_corpus_mix_bpe).
  */
class BpeSpec extends AnyFunSuite with Matchers with TestSpark {

  test("fully-merged vocabulary words encode to one token") {
    // merge chains ending in whole words exist for these (see Bpe.Merges)
    Seq("customer", "vector", "order", "batch", "filter", "column")
      .foreach { w => withClue(w) { Bpe.tokenCount(w) shouldBe 1L } }
  }

  test("unseen words fall back toward characters, never below 1 token") {
    Bpe.tokenCount("zebra") shouldBe 5L // no trained pair applies
    Bpe.tokenCount("x") shouldBe 1L
    Bpe.tokenCount("") shouldBe 0L
  }

  test("encoding is the lowest-rank-first fixpoint (hand example)") {
    // "merger" = m e r g e r: rank-0 (e,r) replace-all merges BOTH sites
    // in one pass -> m er g er; rank-5 (m,er) -> mer g er; nothing else
    // applies ((g,e) can never fire — the 'e' was consumed by rank 0,
    // which is exactly the merge-by-rank-not-position property)
    Bpe.encodeSpaced("merger").trim.split(" ").toSeq shouldBe
      Seq("mer", "g", "er")
    Bpe.tokenCount("merger") shouldBe 3L
  }

  test("token count bounds: 1 <= n <= codepoints for nonempty words") {
    val words = Seq("customer", "zebra", "scan", "aaaa", "slow", "qqqqqqqq")
    words.foreach { w =>
      val n = Bpe.tokenCount(w)
      n should be >= 1L
      n should be <= w.length.toLong
    }
  }

  test("trainer segmentation agrees with the encoder on the training " +
      "vocabulary") {
    // retrain on the same corpus and replay the trainer's own merge
    // applications: the frozen table must reproduce it exactly
    val freqs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(explode(TextHash.words(col("text"))).as("w"))
      .groupBy("w").count()
      .orderBy("w")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    TrainBpe.train(freqs, 48) shouldBe Bpe.Merges
  }

  test("the native expression equals the per-word sum over the shared " +
      "tokenizer") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Customer ORDER vector"),
      (2L, "zebra  merger\tbatch"),
      (3L, ""),
      (4L, "   "),
      (5L, "slow scan slow scan")).toDF("doc_id", "text")
    val viaExpr = docs.select(col("doc_id"), BpeTokenCount(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaWords = docs
      .select(col("doc_id"), TextHash.words(col("text")).as("ws"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[String](1).map(Bpe.tokenCount).sum
      }.toMap
    viaExpr shouldBe viaWords
    viaExpr(1L) shouldBe 3L // all three fully merged (case-folded)
    viaExpr(3L) shouldBe 0L
    viaExpr(4L) shouldBe 0L
  }

  test("native BpeSymbols ≡ the declarative transform/split/flatten " +
      "chain, and size(BpeSymbols) ≡ BpeTokenCount") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{flatten, size => asize, split,
      struct, transform}
    val docs = (Seq(
      (1L, "Customer ORDER vector"),
      (2L, "zebra  merger\tbatch"),
      (3L, "slow scan slow scan"),
      (4L, "unmergeablezzqx y")) ++
      Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text").limit(100)
        .collect().map(r => (r.getLong(0) + 1000L, r.getString(1))))
      .toDF("doc_id", "text")
      .withColumn("_words", TextHash.words(col("text")))
    val native = docs.select(col("doc_id"),
        graft.functions.BpeSymbols(col("_words")).as("_syms"))
    val declarative = docs.select(col("doc_id"),
      flatten(transform(col("_words"), (w, wi) =>
        transform(split(graft.functions.BpeEncode(w), " "),
          s => struct(wi.as("wi"), s.as("sym"))))).as("_syms"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(s => (s.getInt(0), s.getString(1)))).toMap
    val n = rows(native)
    n shouldBe rows(declarative)
    n.values.map(_.size).sum should be > 0
    // the count expression is size(symbols) by the shared encoder
    docs.select(col("doc_id"),
        (asize(graft.functions.BpeSymbols(col("_words"))).cast("long") -
          BpeTokenCount(col("text"))).as("d"))
      .filter(col("d") =!= 0L).count() shouldBe 0L
  }
}
