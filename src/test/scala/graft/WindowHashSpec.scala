package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.{WindowHash, WindowHashUtil}

/** Rolling window hash: the Rabin-Karp recurrence must equal the closed
  * form the oracle states, for every window, under the shared constants.
  */
class WindowHashSpec extends AnyFunSuite with Matchers with TestSpark {

  private val P = BigInt(WindowHashUtil.P)
  private val B = BigInt(WindowHashUtil.B)

  private def h56Ref(s: String): BigInt = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.take(7).foldLeft(BigInt(0))((a, b) => (a << 8) | BigInt(b & 0xff))
  }

  private def closedForm(toks: Seq[String], k: Int): Seq[Long] =
    (0 to toks.length - k).map { p =>
      (0 until k).map(j => h56Ref(toks(p + j)) * B.modPow(k - 1 - j, P))
        .sum.mod(P).toLong
    }

  test("recurrence equals the closed form over random-ish token streams") {
    import spark.implicits._
    val toks = Seq.tabulate(200)(i => s"tok${i * 7919 % 131}")
    for (k <- Seq(1, 2, 8, 20)) {
      val got = Seq(toks).toDF("t")
        .select(WindowHash(col("t"), k).as("g")).collect()(0)
        .getSeq[Long](0)
      got shouldBe closedForm(toks, k)
    }
  }

  test("identical windows collide; short arrays yield empty") {
    import spark.implicits._
    val a = Seq("x", "y", "z", "x", "y", "z", "q")
    val g = Seq(a).toDF("t").select(WindowHash(col("t"), 3).as("g"))
      .collect()(0).getSeq[Long](0)
    g.length shouldBe 5
    g(0) shouldBe g(3) // [x y z] twice
    g(1) should not be g(2)
    Seq(Seq("a", "b")).toDF("t").select(WindowHash(col("t"), 3).as("g"))
      .collect()(0).getSeq[Long](0) shouldBe Seq.empty
  }

  test("powTable matches modPow and the SQL literal is in range") {
    for (e <- 0 until 25)
      BigInt(WindowHashUtil.powB(e)) shouldBe B.modPow(e, P)
    WindowHashUtil.powTable(20).foreach { v =>
      v should be >= 0L
      v should be < WindowHashUtil.P
    }
  }
}
