package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Warehouse layout (SURVEY S12): the reference's Postgres table carries
  * secondary indexes on business_id, date DESC, quality DESC, rating
  * (init_db.sql:33-36). The Spark-land analog is physical layout, not
  * indexes: cluster by business_id (co-locates each business's reviews —
  * the reference's Kafka keying, made durable) and sort within partitions
  * by (business_id, date DESC) so min/max parquet footer stats prune both
  * business_id equality and date-range scans. At 100 TB this is the
  * difference between a full scan and touching a handful of row groups.
  */
object Warehouse {

  def write(cleaned: DataFrame, path: String,
            numPartitions: Option[Int] = None): Unit = {
    val parts = numPartitions.getOrElse(
      cleaned.sparkSession.sessionState.conf.numShufflePartitions)
    cleaned
      .repartition(parts, col("business_id"))
      .sortWithinPartitions(col("business_id"), col("date").desc)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
