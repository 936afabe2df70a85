package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{Corpus, TextDedup}

/** Sliding-window exact substring dedup (the Lee et al. 2022 granularity):
  * any >= K-token verbatim repeat is removed wherever it starts — including
  * spans that deliberately straddle chunkDedup's K-token chunk grid, the
  * alignment blind spot this operator exists to close.
  */
class SubstringDedupSpec extends AnyFunSuite with Matchers with TestSpark {

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(k: Int, rows: (Long, String)*): Map[Long, (String, Long, Long)] =
    TextDedup.substringDedup(df(rows: _*), k = k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("a >= K-token repeat is removed from every doc but the first") {
    val out = run(3,
      1L -> "u v s1 s2 s3 s4 w",
      2L -> "x s1 s2 s3 s4 y z")
    out(1L) shouldBe (("u v s1 s2 s3 s4 w", 7L, 0L))
    // all 4 span tokens go; the unique context stays
    out(2L) shouldBe (("x y z", 7L, 4L))
  }

  test("a K-1-token shared run is NOT removed (threshold semantics)") {
    val out = run(3,
      1L -> "a b p q r",
      2L -> "c d p q x")
    out(2L)._3 shouldBe 0L
  }

  test("within-doc self-repeat keeps only the earlier occurrence") {
    val out = run(3,
      1L -> "s1 s2 s3 m n s1 s2 s3")
    out(1L) shouldBe (("s1 s2 s3 m n", 8L, 3L))
  }

  test("catches the straddling span chunkDedup misses") {
    // chunk grid (k=3): doc 1 tiles [a b c][S1 S2 S3][d e f]; doc 2 tiles
    // [x y S1][S2 S3 z] — the repeated S1 S2 S3 crosses doc 2's chunk
    // boundary, so chunk-level dedup sees only novel chunks...
    val rows = Seq(
      1L -> "a b c s1 s2 s3 d e f",
      2L -> "x y s1 s2 s3 z")
    val chunk = TextDedup.chunkDedup(df(rows: _*), k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    chunk(2L) shouldBe "x y s1 s2 s3 z" // blind spot: nothing removed
    // ...while the sliding-window pass removes exactly the span
    val out = run(3, rows: _*)
    out(1L) shouldBe (("a b c s1 s2 s3 d e f", 9L, 0L))
    out(2L) shouldBe (("x y z", 6L, 3L))
  }

  test("zero-word and short docs pass through untouched") {
    val out = run(3, 1L -> "", 2L -> "a b", 3L -> "a b c")
    out(1L) shouldBe (("", 0L, 0L))
    out(2L) shouldBe (("a b", 2L, 0L))
    out(3L) shouldBe (("a b c", 3L, 0L))
  }

  private def runBpe(k: Int, rows: (Long, String)*): Map[Long, (String, Long, Long)] =
    TextDedup.substringDedupBpe(df(rows: _*), k = k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("BPE granularity catches a sub-word-token repeat that word-level " +
      "windows cannot see") {
    import graft.rules.Bpe
    // 4 words — far under the word-level SubstrGram=8 — but the words
    // are out-of-vocabulary for the trained merges, so they split into
    // enough sub-word tokens to cross SubstrBpeGram=20
    val phrase = "xylophones quagmires flummoxed zeppelins brontosaurus"
    val phraseToks = Bpe.tokenCountText(phrase)
    phraseToks should be >= TextDedup.SubstrBpeGram.toLong
    // flanking words share no token suffix/prefix with each other (a
    // shared flank suffix like beta|delta's "t a" would legitimately
    // extend the duplicate span across the word boundary)
    val rows = Seq(
      1L -> s"alpha beta $phrase gamma",
      2L -> s"dwq $phrase omega kappa")
    // word-level windows (8 words) never fit inside the 5-word repeat:
    val word = run(TextDedup.SubstrGram, rows: _*)
    word(2L)._3 shouldBe 0L
    // ...BPE-level windows do — doc 2 loses exactly the phrase's tokens
    val bpe = runBpe(TextDedup.SubstrBpeGram, rows: _*)
    bpe(1L)._1 shouldBe s"alpha beta $phrase gamma"
    bpe(1L)._3 shouldBe 0L
    bpe(2L)._1 shouldBe "dwq omega kappa"
    bpe(2L)._3 shouldBe phraseToks
    bpe(2L)._2 shouldBe Bpe.tokenCountText(s"dwq $phrase omega kappa")
  }

  test("BPE removal is sub-word exact: a word partially covered by a " +
      "duplicate span keeps only its uncovered symbols") {
    // "xx" -> tokens (x,x); "yy" -> (y,y); "yyz" -> (y,y,z): doc 2's
    // token stream [x x y y z] repeats doc 1's [x x y y] and then
    // diverges MID-WORD inside "yyz". With k=3, windows @0 (x,x,y) and
    // @1 (x,y,y) are duplicates covering positions 0..3; window @2
    // (y,y,z) is novel. So "yyz" is covered only at its first two
    // symbols and must reassemble to its surviving fragment "z".
    val out = runBpe(3,
      1L -> "xx yy",
      2L -> "xx yyz")
    out(1L) shouldBe (("xx yy", 4L, 0L))
    out(2L) shouldBe (("z", 5L, 4L))
  }

  test("BPE variant: zero-word and short-token docs pass through") {
    val out = runBpe(20, 1L -> "", 2L -> "ab cd")
    out(1L) shouldBe (("", 0L, 0L))
    out(2L)._3 shouldBe 0L
    out(2L)._1 shouldBe "ab cd"
  }

  test("boilerplate-injected corpus at BPE granularity: injected docs " +
      "after the global first lose the span's full token run") {
    import graft.rules.Bpe
    val sf = "/root/testdata/sf0.001"
    val bpToks = Bpe.tokenCountText(Corpus.Boilerplate.mkString(" "))
    bpToks should be >= TextDedup.SubstrBpeGram.toLong
    val out = TextDedup.substringDedupBpe(Corpus.withBoilerplate(spark, sf))
    val injected = out.filter(col("doc_id") % 10 === 0)
      .select("doc_id", "n_removed", "clean_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    injected.length should be >= 10
    val bp = Corpus.Boilerplate.mkString(" ")
    injected.head._3 should include(bp)
    injected.tail.foreach { case (id, nRemoved, clean) =>
      withClue(s"doc $id: ") {
        nRemoved should be >= bpToks
        clean should not include bp
      }
    }
  }

  test("boilerplate-injected corpus: every injected doc but the global " +
      "first loses at least the 12-token span") {
    val sf = "/root/testdata/sf0.001"
    val out = TextDedup.substringDedup(Corpus.withBoilerplate(spark, sf))
    val injected = out.filter(col("doc_id") % 10 === 0)
      .select("doc_id", "n_removed", "clean_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    injected.length should be >= 10
    val bp = Corpus.Boilerplate.mkString(" ")
    // the global first occurrence keeps the span verbatim
    injected.head._3 should include(bp)
    // every later injected doc loses it entirely
    injected.tail.foreach { case (id, nRemoved, clean) =>
      withClue(s"doc $id: ") {
        nRemoved should be >= 12L
        clean should not include bp
      }
    }
  }
}
