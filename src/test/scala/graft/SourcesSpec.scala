package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Clean
import graft.sources.Sources

/** S1-S5: JSONL ingest with malformed-line skip, schema mapping with
  * timestamp fallback, Kafka record shape, end-to-end file -> clean.
  */
class SourcesSpec extends AnyFunSuite with Matchers with TestSpark {

  private def writeJsonl(lines: String*): String = {
    val dir = Files.createTempDirectory("graft-jsonl")
    Files.writeString(dir.resolve("part-0.json"), lines.mkString("\n"))
    dir.toString
  }

  private val good =
    """{"review_id":"r1","business_id":"b1","user_id":"u1","stars":5.0,
      |"text":"this place was absolutely great for the family",
      |"date":"2020-05-01 10:00:00","useful":1,"funny":0,"cool":2}"""
      .stripMargin.replace("\n", "")
  private val badDate = good.replace("r1", "r2")
    .replace("2020-05-01 10:00:00", "not-a-date")
  private val malformed = """{"review_id": "r3", "stars": }"""

  test("JSONL scan skips malformed lines; date fallback fills now()") {
    val dir = writeJsonl(good, malformed, badDate)
    val raw = Sources.asRawReviews(Sources.jsonlReviews(spark, dir))
    val rows = raw.collect()
    rows.map(_.getAs[String]("review_id")).sorted shouldBe Array("r1", "r2")
    val r1 = rows.find(_.getString(0) == "r1").get
    r1.getAs[Double]("rating") shouldBe 5.0
    r1.getAs[java.sql.Timestamp]("date") shouldBe
      java.sql.Timestamp.valueOf("2020-05-01 10:00:00")
    // bad date fell back to (recent) current_timestamp
    val r2 = rows.find(_.getString(0) == "r2").get
    math.abs(r2.getAs[java.sql.Timestamp]("date").getTime -
      System.currentTimeMillis()) should be < 3600_000L
  }

  test("limit mirrors --limit N") {
    val dir = writeJsonl(good, badDate)
    Sources.jsonlReviews(spark, dir, limit = Some(1)).count() shouldBe 1
  }

  test("jsonl -> clean pipeline end to end (E4 batch analog)") {
    val dir = writeJsonl(good, badDate)
    val ann = Clean.annotate(
      Sources.asRawReviews(Sources.jsonlReviews(spark, dir))
        .drop("ingestion_timestamp"))
    ann.filter(ann("accepted")).count() shouldBe 2
  }

  test("kafka record shape is (key=business_id, value=json)") {
    val dir = writeJsonl(good)
    val recs = Sources.asKafkaRecords(
      Sources.asRawReviews(Sources.jsonlReviews(spark, dir)))
    recs.columns.toSeq shouldBe Seq("key", "value")
    val r = recs.collect().head
    r.getAs[String]("key") shouldBe "b1"
    r.getAs[String]("value") should include("\"review_id\":\"r1\"")
  }

  test("kafka serde round-trip: asKafkaRecords -> from_json is identity") {
    import org.apache.spark.sql.functions.{col, from_json}
    import spark.implicits._
    import graft.schema.RawReview
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    // includes nulls (to_json omits them; from_json must restore them) and
    // text that stresses JSON escaping
    val rows = Seq(
      RawReview("r1", "b1", "u1", Some(4.0),
        "quotes \" backslash \\ newline \n tab \t unicode é", ts,
        Some(1), Some(0), Some(2), "test"),
      RawReview("r2", "b2", "u2", None, "plain", ts, None, None, None, "test"))
    val df = rows.toDF()
    val recs = Sources.asKafkaRecords(df)
    val back = recs.select(from_json(col("value"), df.schema).as("r"))
      .select("r.*")
    back.schema shouldBe df.schema
    back.collect() should contain theSameElementsAs df.collect()
    recs.select("key").collect().map(_.getString(0)).sorted shouldBe
      Array("b1", "b2")
  }

  test("streaming replay reads the same schema with per-trigger throttle") {
    val dir = writeJsonl(good, badDate)
    val stream = Sources.replayStream(spark, dir)
    stream.isStreaming shouldBe true
    val q = Sources.asRawReviews(stream).writeStream
      .format("memory").queryName("replay_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table("replay_out").count() shouldBe 2
    } finally q.stop()
  }
}
