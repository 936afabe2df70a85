package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.FoldStore

/** The durable fold store behind the streaming standing-index legs:
  * seed/append/read round-trips, the durable replay guard, restart
  * recovery (manifest adoption + orphan sweep), hash-prefix partition
  * pruning at the scan, and compaction.
  */
class FoldStoreSpec extends AnyFunSuite with Matchers with TestSpark {

  private def rows(ids: Long*) = {
    import spark.implicits._
    ids.toDF("id")
      .withColumn("h", col("id") * 7)
      .withColumn("pk", FoldStore.pk(8, col("h")))
  }

  private def tmp() = Files.createTempDirectory("foldstore").toString

  test("seed + append round-trip: read() is the multiset union of the " +
      "seed and every fold; empty folds still advance the replay guard") {
    val dir = tmp()
    val store = FoldStore.open(spark, dir, rows(1, 2, 3), prefixParts = 8)
    store.lastFoldedId shouldBe -1L
    store.read().count() shouldBe 3

    store.append(rows(10, 11), 0L)
    store.lastFoldedId shouldBe 0L
    store.read().select("id").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 2, 3, 10, 11)

    // an all-dup batch folds zero rows but must still commit its id
    store.append(rows().filter(lit(false)), 1L)
    store.lastFoldedId shouldBe 1L
    store.read().count() shouldBe 5
  }

  test("restart recovery: a fresh open() adopts the manifest (segments " +
      "+ lastFoldedId), never re-evaluates the seed, and sweeps orphan " +
      "directories a crash left behind") {
    val dir = tmp()
    val store = FoldStore.open(spark, dir, rows(1, 2), prefixParts = 8)
    store.append(rows(10), 5L)

    // crash debris: a published-but-never-committed segment and a tmp dir
    Files.createDirectories(Paths.get(dir, "data", "seg=orphan", "pk=0"))
    Files.createDirectories(Paths.get(dir, ".tmp-crashed"))

    var seedForced = false
    val reopened = FoldStore.open(spark, dir,
      { seedForced = true; rows(99) }, prefixParts = 8)
    seedForced shouldBe false
    reopened.lastFoldedId shouldBe 5L
    reopened.read().select("id").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 2, 10)
    Files.exists(Paths.get(dir, "data", "seg=orphan")) shouldBe false
    Files.exists(Paths.get(dir, ".tmp-crashed")) shouldBe false
  }

  test("readFor prunes at partition granularity: the scan carries a pk " +
      "partition filter and reads only the touched buckets' rows") {
    val dir = tmp()
    val store = FoldStore.open(spark, dir, rows(1L to 64L: _*),
      prefixParts = 8)
    val all = store.read().collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[Int]("pk")))
    val somePk = all.head._2
    val pruned = store.readFor(Seq(somePk))
    pruned.collect().map(_.getAs[Long]("id")).sorted shouldBe
      all.filter(_._2 == somePk).map(_._1).sorted
    // the pk predicate must reach the scan as a PARTITION filter (file
    // pruning), not a post-scan row filter
    val plan = pruned.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan.split("PartitionFilters")(1).take(200) should include("pk")
    // and an empty touch set reads nothing
    store.readFor(Nil).count() shouldBe 0
  }

  test("compaction merges every live segment into one with identical " +
      "rows, and the superseded directories are swept") {
    val dir = tmp()
    val store = FoldStore.open(spark, dir, rows(1, 2), prefixParts = 8,
      compactAfter = 3)
    store.append(rows(10), 0L)
    store.append(rows(11), 1L)
    store.segmentCount shouldBe 3
    // 4th segment exceeds compactAfter=3 -> compacts to 1
    store.append(rows(12), 2L)
    store.segmentCount shouldBe 1
    store.lastFoldedId shouldBe 2L
    store.read().select("id").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 2, 10, 11, 12)
    // exactly one seg=* directory remains on disk
    val segs = {
      val s = Files.list(Paths.get(dir, "data"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("seg=")).toVector
      } finally s.close()
    }
    segs.size shouldBe 1
    // a reopen serves the compacted state
    val reopened = FoldStore.open(spark, dir, rows(99), prefixParts = 8)
    reopened.read().count() shouldBe 5
    reopened.lastFoldedId shouldBe 2L
  }
}
