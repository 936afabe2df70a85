package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Storage-tier policy for pinned frames (the query memo, the
  * substring-dedup gram checkpoints, Ranked.perKey's ranked frame).
  *
  * The r7 sf1 A/B priced both tiers under one condition: serialized
  * (MEMORY_AND_DISK_SER) shrinks the resident working set 2-4× but
  * charges a DESERIALIZATION per read, and re-read-heavy consumers pay
  * it many times over — q_substring_dedup_bpe 23.2 → 58.8 s,
  * q_ccnet_buckets 17.3 → 27.3 s at sf1, with a 10-25% tax even on
  * memo consumers that merely re-read text frames. The sf3+ pool
  * pressure the serialized tier was introduced for (q_ccnet_buckets
  * 51.7 → 120 s monotone pass growth in the full sweep) turned out to
  * be dominated by DEAD blocks lingering across passes — cured by the
  * bench's inter-pass reclaim — not by the live working set's size.
  *
  * So the default is the deserialized tier (zero-copy reads), and the
  * serialized tier is an explicit operator choice for deployments whose
  * live pinned set genuinely approaches the storage pool (the 100 TB
  * cluster sizing rule stays: size executor storage to the resident
  * working set, and when you cannot, trade CPU for fit with
  * `spark.graft.storage.tier=ser`).
  */
object Tier {

  val ConfKey = "spark.graft.storage.tier" // "deser" (default) | "ser"

  def level(spark: SparkSession): StorageLevel =
    if (spark.conf.getOption(ConfKey).contains("ser"))
      StorageLevel.MEMORY_AND_DISK_SER
    else StorageLevel.MEMORY_AND_DISK
}
