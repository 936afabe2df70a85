package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest surface (SURVEY §2.1 S1-S7): JSONL scan with permissive error
  * handling, raw-Yelp -> engine schema mapping, timestamp parse-with-
  * fallback, rate-limited streaming replay, and Kafka-format wiring.
  */
object Sources {

  /** Raw Yelp review JSON schema (producer.py:68-80 field set). */
  val rawYelpSchema: StructType = StructType(Seq(
    StructField("review_id", StringType),
    StructField("business_id", StringType),
    StructField("user_id", StringType),
    StructField("stars", DoubleType), // renamed to rating on ingest
    StructField("text", StringType),
    StructField("date", StringType), // '%Y-%m-%d %H:%M:%S', parsed below
    StructField("useful", IntegerType),
    StructField("funny", IntegerType),
    StructField("cool", IntegerType),
    StructField("_corrupt_record", StringType))) // PERMISSIVE capture

  /** S1: line-by-line JSONL scan, malformed lines skipped (the reference
    * logs-and-continues, producer.py:45-50 — PERMISSIVE + corrupt-record
    * filter is the same contract). `limit` mirrors `--limit N` (O1).
    */
  def jsonlReviews(spark: SparkSession, path: String,
                   limit: Option[Int] = None): DataFrame = {
    val df = spark.read
      .schema(rawYelpSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .filter(col("_corrupt_record").isNull && col("review_id").isNotNull)
      .drop("_corrupt_record")
    limit.fold(df)(df.limit)
  }

  /** S2+S3: raw Yelp -> RawYelpReview schema mapping (stars->rating, source
    * injection, ingestion timestamp; producer.py:58-80) with the timestamp
    * parse-or-now fallback (producer.py:62-66).
    */
  def asRawReviews(yelp: DataFrame,
                   source: String = "yelp_dataset"): DataFrame =
    yelp.select(
      col("review_id"), col("business_id"), col("user_id"),
      col("stars").as("rating"),
      col("text"),
      coalesce(try_to_timestamp(col("date"), lit("yyyy-MM-dd HH:mm:ss")),
        current_timestamp()).as("date"),
      col("useful"), col("funny"), col("cool"),
      lit(source).as("source"),
      current_timestamp().as("ingestion_timestamp"))

  /** O4/S6: deterministic out-of-order simulation (producer.py:52-53). */
  def shuffled(df: DataFrame, seed: Long): DataFrame =
    df.orderBy(rand(seed))

  /** S5: rate-limited streaming replay of a JSONL directory —
    * maxFilesPerTrigger is the file-source throttle (the reference throttles
    * rows/s with jitter, a load-gen detail; the engine contract is "bounded
    * ingest per micro-batch").
    */
  def replayStream(spark: SparkSession, dir: String,
                   filesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(rawYelpSchema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .filter(col("_corrupt_record").isNull && col("review_id").isNotNull)
      .drop("_corrupt_record")

  /** S4: keyed JSON publish shape for the Kafka sink (key = business_id,
    * producer.py:114); broker-gated, so tests assert the frame shape only.
    */
  def asKafkaRecords(df: DataFrame): DataFrame =
    df.select(col("business_id").cast("string").as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))

  /** P13: ISO-8601 serde at topic boundaries (faust_app.py:13-18). */
  def toIso(ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
  def fromIso(s: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    to_timestamp(s, "yyyy-MM-dd'T'HH:mm:ss")
}
