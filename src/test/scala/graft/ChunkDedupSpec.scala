package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.TextDedup

/** C4-style sub-document chunk dedup: K-token chunks, corpus-global first
  * occurrence (by (doc_id, chunk_pos)) wins, survivors reassembled in
  * document order.
  */
class ChunkDedupSpec extends AnyFunSuite with Matchers with TestSpark {

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(rows: (Long, String)*): Map[Long, (String, Long, Long)] =
    TextDedup.chunkDedup(df(rows: _*), k = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("repeated chunk across docs survives only in the first doc") {
    val out = run(
      1L -> "a b c x y z",     // chunks: "a b c", "x y z"
      2L -> "p q r a b c")     // "a b c" already seen in doc 1
    out(1L) shouldBe (("a b c x y z", 2L, 2L))
    out(2L) shouldBe (("p q r", 2L, 1L))
  }

  test("first occurrence is ordered by doc_id then chunk position") {
    val out = run(
      1L -> "a b c a b c",     // same chunk twice within one doc
      2L -> "a b c")
    // within doc 1 only position 0 survives; doc 2 loses its only chunk
    out(1L) shouldBe (("a b c", 2L, 1L))
    out(2L) shouldBe (("", 1L, 0L))
  }

  test("trailing short chunk dedups like any other") {
    val out = run(
      1L -> "a b c d",         // chunks: "a b c", "d"
      2L -> "d")               // "d" = doc 1's trailing chunk
    out(1L) shouldBe (("a b c d", 2L, 2L))
    out(2L) shouldBe (("", 1L, 0L))
  }

  test("zero-word and whitespace-only docs pass through empty") {
    val out = run(1L -> "", 2L -> "   ", 3L -> "a b c")
    out(1L) shouldBe (("", 0L, 0L))
    out(2L) shouldBe (("", 0L, 0L))
    out(3L) shouldBe (("a b c", 1L, 1L))
  }

  test("chunking normalizes whitespace runs like the shared tokenizer") {
    val out = run(
      1L -> "a  b\tc   x y z",
      2L -> "a b c")
    out(1L)._1 shouldBe "a b c x y z"
    out(2L) shouldBe (("", 1L, 0L))
  }

  test("order of surviving chunks is the original document order") {
    val out = run(
      1L -> "m n o",
      2L -> "x y z m n o p q r") // loses its MIDDLE chunk to doc 1
    out(2L) shouldBe (("x y z p q r", 3L, 2L))
  }
}
