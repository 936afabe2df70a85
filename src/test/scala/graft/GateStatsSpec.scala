package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.TextAnalysis

/** The fused GateStats scan must equal the expression forms it replaces
  * (split/rlike/concat_ws Gopher stats, EnStopwords regexp_count, the
  * per-word md5 classifier fold) — column for column, on \b and
  * tokenizer edge cases and on real documents.
  */
class GateStatsSpec extends AnyFunSuite with Matchers with TestSpark {

  private val edgeDocs = Seq(
    1L -> "the quick brown fox and the lazy dog of it",
    2L -> "the, (and) of. to! it?", // punctuation is a \b boundary
    3L -> "the_ the1 athe thea _the", // \w-extended runs never match
    4L -> "thé café éthe the", // Java \b: é is a word char
    5L -> "the世the 世 the", // CJK glues a run; still one ws-token
    6L -> (new String(Character.toChars(0x10400)) + "the the"), // astral
    7L -> "😀 the 😀", // surrogate pairs as standalone tokens
    8L -> "", // empty
    9L -> "   \t\n\f\r ", // ASCII whitespace only
    10L -> "a b the", // NBSP is NOT a \s splitter (one token)
    11L -> "... ?! -- 123 42the", // alpha-free tokens, digit runs
    12L -> "THE And OF", // lower() applied upstream of both forms
    13L -> ("word " * 60).trim) // passes the word-count gate

  private def frame() = {
    import spark.implicits._
    edgeDocs.toDF("doc_id", "text")
  }

  private def realDocs() =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")

  private def compare(df: org.apache.spark.sql.DataFrame): Unit = {
    val cols = Seq("doc_id", "word_count", "mean_word_len", "alpha_frac",
      "stop_count", "keep", "reject_reason", "clf_mean_weight", "clf_keep")
    val fused = TextAnalysis.classifierAnnotate(
        TextAnalysis.gopherAnnotate(df))
      .select(cols.head, cols.tail: _*).orderBy("doc_id").collect()
    val ref = TextAnalysis.classifierAnnotateRef(
        TextAnalysis.gopherAnnotateRef(df))
      .select(cols.head, cols.tail: _*).orderBy("doc_id").collect()
    fused.zip(ref).foreach { case (f, r) => f shouldBe r }
    fused.length shouldBe ref.length
  }

  test("fused gate columns ≡ expression forms on edge cases") {
    compare(frame())
  }

  test("fused gate columns ≡ expression forms on real documents") {
    compare(realDocs())
  }

  test("qualityClassifier (fused) ≡ its reference on real documents") {
    // the registry query itself moved to the fused scan — pin it against
    // the original classifierExprs-based derivation
    val got = TextAnalysis.qualityClassifier(realDocs()).collect()
    val ref = TextAnalysis.classifierAnnotateRef(realDocs())
      .select(col("doc_id"))
      .join(TextAnalysis.qualityClassifier(realDocs()), Seq("doc_id"))
      .orderBy("doc_id").collect()
    got.length shouldBe ref.length
    val fromRef = TextAnalysis.classifierAnnotateRef(realDocs())
      .select(col("doc_id"), col("clf_mean_weight"), col("clf_keep"))
      .orderBy("doc_id").collect()
    val fromFused = TextAnalysis.qualityClassifier(realDocs())
      .select(col("doc_id"), col("mean_weight"), col("keep"))
      .orderBy("doc_id").collect()
    fromFused.zip(fromRef).foreach { case (f, r) => f shouldBe r }
  }
}
