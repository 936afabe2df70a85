package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{Corpus, TextDedup}

/** Incremental substring dedup: full-rebuild value identity when the
  * standing corpus precedes the increment (the deployment ordering), the
  * standing-wins rule, and the O(increment) index merge.
  */
class SubstrIncrSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  test("incremental output ≡ full substringDedup over the union, " +
      "restricted to the increment (ordered-id deployment)") {
    val standing = Corpus.withBoilerplate(spark, dir)
    val incr = Corpus.substrIncrement(spark, dir)
    val got = TextDedup.substringDedupIncremental(
        TextDedup.substrGramRows(standing), incr)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val minIncr = 200000L
    val want = TextDedup.substringDedup(standing.unionAll(incr))
      .filter(col("doc_id") >= minIncr)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    got should contain theSameElementsInOrderAs want
  }

  test("standing always wins: a gram present in the standing corpus " +
      "removes even the increment's FIRST occurrence") {
    import spark.implicits._
    val k = TextDedup.SubstrGram
    val span = (1 to k).map(i => s"w$i").mkString(" ")
    val standing = Seq((10L, s"$span tail words here")).toDF("doc_id", "text")
    // increment doc carries the standing span once — its sole (keeper)
    // occurrence must still lose
    val incr = Seq((20L, s"alpha beta $span")).toDF("doc_id", "text")
    val out = TextDedup.substringDedupIncremental(
      TextDedup.substrGramRows(standing), incr).collect()
    out.length shouldBe 1
    out.head.getString(1) shouldBe "alpha beta"
    out.head.getLong(3) shouldBe k.toLong
  }

  test("within-increment first occurrence survives when the standing " +
      "corpus has never seen the gram") {
    import spark.implicits._
    val k = TextDedup.SubstrGram
    val span = (1 to k).map(i => s"n$i").mkString(" ")
    val standing = Seq((10L, "completely unrelated standing text"))
      .toDF("doc_id", "text")
    val incr = Seq(
      (20L, span), // first occurrence: keeper, survives
      (21L, s"pre $span")) // repeat: loses the span
      .toDF("doc_id", "text")
    val out = TextDedup.substringDedupIncremental(
        TextDedup.substrGramRows(standing), incr)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    out should contain((20L, span, 0L))
    out should contain((21L, "pre", k.toLong))
  }

  test("the subgrams index is a per-doc map: IndexStore merge of " +
      "(standing, increment) ≡ one build over the union") {
    val standing = Corpus.withBoilerplate(spark, dir)
    val incr = Corpus.substrIncrement(spark, dir)
    val merged = TextDedup.substrGramRows(standing)
      .unionAll(TextDedup.substrGramRows(incr))
      .groupBy("doc_id", "gh").count()
    val rebuild = TextDedup.substrGramRows(standing.unionAll(incr))
      .groupBy("doc_id", "gh").count()
    merged.exceptAll(rebuild).count() shouldBe 0L
    rebuild.exceptAll(merged).count() shouldBe 0L
  }
}
