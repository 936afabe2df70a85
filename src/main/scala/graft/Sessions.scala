package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession configuration for all mains and tests: the settings
  * here are part of the engine's correctness surface (UTC session TZ, nanos
  * handling) or its local-mode scale tuning (shuffle partitions sized to
  * cores, AQE on — on a real cluster these come from spark-submit conf).
  */
object Sessions {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.rules.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
}
