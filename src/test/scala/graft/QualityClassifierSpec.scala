package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.TextAnalysis

/** fastText-style linear quality classifier: hashed token features x a
  * deterministic weight table, integer margin, keep decision.
  */
class QualityClassifierSpec extends AnyFunSuite with Matchers with TestSpark {

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Reference weight re-derived independently of the Spark expression:
    * md5-prefix hash -> bucket -> Knuth-cycle weight, as documented.
    */
  private def refWeight(token: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 14)
    val h56 = java.lang.Long.parseLong(hex, 16)
    val bucket = h56 % TextAnalysis.ClfBuckets
    bucket * TextAnalysis.ClfKnuth % TextAnalysis.ClfCycle -
      (TextAnalysis.ClfCycle - 1) / 2
  }

  test("score is the sum of per-token weights; mean and keep follow") {
    val out = TextAnalysis.qualityClassifier(
      df(1L -> "alpha beta gamma", 2L -> "alpha alpha"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    val Seq(wa, wb, wg) = Seq("alpha", "beta", "gamma").map(refWeight)
    val s1 = wa + wb + wg
    out(1L) shouldBe ((3L, s1,
      BigDecimal(s1.toDouble / 3).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble, s1 >= 0))
    // repeated tokens count every occurrence (bag, not set)
    out(2L)._2 shouldBe 2 * wa
  }

  test("empty and whitespace-only docs are rejected with zero score") {
    val out = TextAnalysis.qualityClassifier(df(1L -> "", 2L -> "   "))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    out(1L) shouldBe ((0L, 0L, 0.0, false))
    out(2L) shouldBe ((0L, 0L, 0.0, false))
  }

  test("weight table is zero-mean-ish and spans both signs on testdata") {
    val out = TextAnalysis.qualityClassifier(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"))
    val kept = out.filter("keep").count()
    val total = out.count()
    // a degenerate table (all-positive or all-negative weights) would
    // keep everything or nothing — the classifier must actually split
    kept should be > 0L
    kept should be < total
  }

  test("tokenization matches the shared words() (case-folded, ws runs)") {
    val a = TextAnalysis.qualityClassifier(df(1L -> "Alpha  BETA\tgamma"))
      .collect()(0)
    val b = TextAnalysis.qualityClassifier(df(1L -> "alpha beta gamma"))
      .collect()(0)
    a.getLong(2) shouldBe b.getLong(2)
  }
}
