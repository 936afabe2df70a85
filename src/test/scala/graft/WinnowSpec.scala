package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.TextDedup

/** MOSS winnowing fingerprints: the Spark array-primitive formulation must
  * match a straightforward driver-side reference (explicit window scan,
  * rightmost-min on ties), and the winnowing guarantee must hold — two docs
  * sharing a substring of >= W + GramLen - 1 chars share a fingerprint.
  */
class WinnowSpec extends AnyFunSuite with Matchers with TestSpark {

  private val W = TextDedup.WinnowW
  private val K = TextDedup.GramLen

  /** md5-prefix h56, matching TextHash.h56's conv(substring(md5,1,14)). */
  private def h56Ref(s0: String): Long = {
    val dg = java.security.MessageDigest.getInstance("MD5")
      .digest(s0.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (dg(i) & 0xffL); i += 1 }
    h
  }

  /** Reference winnow: selected (position -> hash) map. */
  private def refWinnow(text: String): Map[Int, Long] = {
    val n = math.max(text.length - (K - 1), 0)
    val hs = (0 until n).map(i => h56Ref(text.substring(i, i + K)))
    if (n < W) Map.empty
    else (0 to n - W).map { p =>
      val win = hs.slice(p, p + W)
      val m = win.min
      val idx = p + win.lastIndexOf(m) // rightmost min
      idx -> hs(idx)
    }.toMap
  }

  test("matches the driver-side reference on tricky strings") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaa",          // all grams equal: ties everywhere
      "abababababababababab",          // period-2 ties
      "short",                          // < GramLen: no grams
      "exactly8",                       // exactly one gram
      "123456789ab",                    // n < W windows
      "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = TextDedup.winnow(df).collect()
    out.foreach { r =>
      val t = texts(r.getLong(0).toInt)
      val ref = refWinnow(t)
      val refFps = ref.values.toSeq
      withClue(s"text='$t': ") {
        r.getLong(1) shouldBe math.max(t.length - (K - 1), 0).toLong
        r.getLong(3) shouldBe ref.size.toLong // n_fp = distinct positions
        if (ref.nonEmpty) {
          r.getLong(4) shouldBe refFps.min
          r.getLong(5) shouldBe refFps.max
          r.getLong(6) shouldBe refFps.map(_ % 1000003).sum
        } else {
          r.isNullAt(4) shouldBe true
          r.isNullAt(5) shouldBe true
          r.getLong(6) shouldBe 0L
        }
      }
    }
  }

  test("winnowing guarantee: docs sharing >= W+K-1 chars share a print") {
    val shared = "commonsharedrun" // 15 chars >= W + K - 1 = 11
    val a = s"xxxa ${shared} tail one"
    val b = s"completely different head ${shared} zz"
    val fa = refWinnow(a).values.toSet
    val fb = refWinnow(b).values.toSet
    (fa intersect fb) should not be empty
  }
}
