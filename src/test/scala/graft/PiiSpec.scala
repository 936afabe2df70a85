package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Pii

/** PII redaction goldens: counts and replacement on hand-built text,
  * including multiple hits, boundary non-matches, and the seeding helper.
  */
class PiiSpec extends AnyFunSuite with Matchers with TestSpark {

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("emails, IPs and phones are counted and redacted") {
    val out = Pii.scrub(docsOf(
      (1L, "mail a.b+c@ex-ample.org and d@e.io from 192.168.0.1"),
      (2L, "call 555-123-4567 or 555.987.6543 now"),
      (3L, "no pii here, just 1.2 and v1.2.3 and 12-34"),
      (4L, "")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    out shouldBe Array(
      (1L, 2L, 1L, 0L),
      (2L, 0L, 0L, 2L),
      (3L, 0L, 0L, 0L),
      (4L, 0L, 0L, 0L))
  }

  test("redacted text replaces every hit with its typed token") {
    import org.apache.spark.sql.functions._
    // recover the scrubbed text via length/md5 on a known input
    val scrubbedLen = Pii.scrub(docsOf((1L, "x 1.2.3.4 y z@q.co")))
      .select(col("scrubbed_len")).head.getLong(0)
    "x [IP] y [EMAIL]".length.toLong shouldBe scrubbedLen
  }

  test("withPii seeds the residue classes deterministically") {
    val seeded = Pii.withPii(
      docsOf((7L, "a"), (11L, "b"), (13L, "c"), (3L, "d"), (0L, "e"))
        .selectExpr("doc_id", "text", "'s' AS source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    seeded(7L) shouldBe "a contact user7@example.com"
    seeded(11L) shouldBe "b from 10.0.11.1"
    seeded(13L) shouldBe "c call 555-123-4567"
    seeded(3L) shouldBe "d"
    // doc_id 0 is in every residue class: all three appended in order
    seeded(0L) shouldBe
      "e contact user0@example.com from 10.0.0.1 call 555-123-4567"
  }
}
