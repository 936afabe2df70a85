package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet table loader for the driver testdata layout
  * (`/root/testdata/sf{N}/<name>.parquet`, see TESTDATA.md). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in two physical parquet encodings across
    * testdata generations, so the loader normalizes BOTH to the same
    * session-UTC TIMESTAMP the rest of the engine (and the DuckDB oracle,
    * which reads the identical file) sees:
    *  - TIMESTAMP(NANOS): Spark cannot read it natively; Sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong=true` so `ts` arrives as
    *    nanos-since-epoch LONG and we floor-divide to micros — exactly
    *    DuckDB's ns->us truncation.
    *  - timestamp[us] (isAdjustedToUTC=false): Spark infers TIMESTAMP_NTZ;
    *    the session timezone is pinned to UTC (Sessions.builder), so the
    *    NTZ->TIMESTAMP cast reinterprets the wall-clock as the same UTC
    *    instant DuckDB reads.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
}
