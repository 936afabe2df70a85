package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver testdata layout
  * (`/root/testdata/sf{N}/<name>.parquet`, see TESTDATA.md). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` carries TIMESTAMP(NANOS) parquet timestamps, which Spark does
    * not read natively. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see Sessions.builder) so
    * `ts` arrives as nanos-since-epoch LONG; we floor-divide to micros —
    * exactly DuckDB's ns->us truncation — so both engines see identical
    * timestamps.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
}
