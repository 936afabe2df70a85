package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.FoldStore

/** The durable fold store behind the streaming standing-index legs:
  * seed/append/read round-trips, the durable replay guard, restart
  * recovery (manifest adoption + orphan sweep), hash-prefix partition
  * pruning at the scan, the single-writer lock, and the r12 per-bucket
  * incremental compaction (value identity with a full merge + bounded
  * per-step rewrite + retirement of fully-excluded segments).
  * Crash-window states are exercised separately in FoldCrashSpec.
  */
class FoldStoreSpec extends AnyFunSuite with Matchers with TestSpark {

  private def rows(ids: Long*) = {
    import spark.implicits._
    ids.toDF("id")
      .withColumn("h", col("id") * 7)
      .withColumn("pk", FoldStore.pk(8, col("h")))
  }

  private def tmp() = Files.createTempDirectory("foldstore").toString

  private def segDirs(dir: String): Vector[String] = {
    val data = Paths.get(dir, "data")
    if (!Files.isDirectory(data)) Vector.empty
    else {
      val s = Files.list(data)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("seg=")).toVector
      } finally s.close()
    }
  }

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
    store.close()
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
    store.simulateCrash()

    var seedForced = false
    val reopened = FoldStore.open(spark, dir,
      { seedForced = true; rows(99) }, prefixParts = 8)
    seedForced shouldBe false
    reopened.lastFoldedId shouldBe 5L
    reopened.read().select("id").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 2, 10)
    Files.exists(Paths.get(dir, "data", "seg=orphan")) shouldBe false
    Files.exists(Paths.get(dir, ".tmp-crashed")) shouldBe false
    reopened.close()
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
    store.close()
  }

  test("single-writer lock: a second open() on a held directory fails " +
      "fast; close() releases the lock for the next writer") {
    val dir = tmp()
    val store = FoldStore.open(spark, dir, rows(1, 2), prefixParts = 8)
    val e = intercept[IllegalStateException] {
      FoldStore.open(spark, dir, rows(99), prefixParts = 8)
    }
    e.getMessage should include("another writer")
    store.close()
    val next = FoldStore.open(spark, dir, rows(99), prefixParts = 8)
    next.read().count() shouldBe 2 // adopted, not reseeded
    next.close()
  }

  test("incremental compaction: each step rewrites ONLY the cursor's " +
      "bucket window, value identity with the full multiset holds " +
      "through many folds, fully-excluded segments retire, and the " +
      "on-disk segment count stays bounded") {
    val dir = tmp()
    // K=1 of 8 buckets per step: a full rewrite cycle is 8 folds
    val store = FoldStore.open(spark, dir, rows(1L to 16L: _*),
      prefixParts = 8, compactAfter = 2, compactBuckets = 1)
    var expected = (1L to 16L).toVector
    var maxSegs = 0
    (0 until 24).foreach { b =>
      val lo = 100L + b * 2
      store.append(rows(lo, lo + 1), b.toLong)
      // the compaction step runs on the store's background thread —
      // drain it so the per-fold count assertions are deterministic
      // (value identity holds at ANY point: the manifest swap is atomic)
      store.awaitCompaction()
      expected = expected ++ Vector(lo, lo + 1)
      store.read().select("id").collect().map(_.getLong(0)).sorted shouldBe
        expected.sorted.toArray
      maxSegs = math.max(maxSegs, store.segmentCount)
    }
    // no zombie entries: a fully-excluded segment must have retired
    store.liveSegments.foreach { s =>
      s.liveBuckets should not be empty
    }
    // segment count stays bounded: threshold + one cycle of step
    // segments + in-flight folds (not O(#folds))
    maxSegs should be <= 2 + 2 * 8 + 2
    // on-disk dirs = live + at most one grace window of retirees
    segDirs(dir).size should be <= store.segmentCount + 2 * 8
    store.close()

    // a reopen serves the identical multiset (manifest round-trips the
    // per-(segment, bucket) exclusions and the cursor)
    val reopened = FoldStore.open(spark, dir, rows(0), prefixParts = 8,
      compactAfter = 2, compactBuckets = 1)
    reopened.read().select("id").collect().map(_.getLong(0)).sorted shouldBe
      expected.sorted.toArray
    reopened.lastFoldedId shouldBe 23L
    reopened.close()
  }

  test("a v1 (pre-r12) manifest is adopted across the format upgrade: " +
      "fold id and segments recovered, bucket sets relisted from disk") {
    val dir = tmp()
    val store = FoldStore.open(spark, dir, rows(1, 2, 3), prefixParts = 8)
    store.append(rows(10), 0L)
    val nonces = store.liveSegments.map(_.nonce)
    store.close()
    // rewrite the manifest in the v1 line format (foldId, schema, nonces)
    val man = Paths.get(dir, "MANIFEST")
    val schema = Files.readString(man).split("\n")(2)
    Files.writeString(man, (Seq("0", schema) ++ nonces).mkString("\n"))
    Files.deleteIfExists(Paths.get(dir, "MANIFEST.bak"))

    val reopened = FoldStore.open(spark, dir, fail("no reseed"),
      prefixParts = 8)
    reopened.lastFoldedId shouldBe 0L
    reopened.read().select("id").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 2, 3, 10)
    reopened.liveSegments.foreach(_.buckets should not be empty)
    reopened.close()
  }

  test("a compaction step's rewrite segment covers only the cursor " +
      "window (bounded per-fold rewrite), and a full cursor cycle " +
      "retires every pre-cycle segment") {
    val dir = tmp()
    val store = FoldStore.open(spark, dir, rows(1L to 32L: _*),
      prefixParts = 8, compactAfter = 100, compactBuckets = 2)
    (0 until 3).foreach(b => store.append(rows(200L + b), b.toLong))
    val preCycle = store.liveSegments.map(_.nonce).toSet
    val before = store.read().select("id").collect()
      .map(_.getLong(0)).sorted

    // drive one explicit step and inspect the published slice
    val c0 = store.compactCursor
    val window = Set(c0 % 8, (c0 + 1) % 8)
    store.compactStep()
    val added = store.liveSegments.filterNot(s => preCycle(s.nonce))
    // the published slice (absent only if the window held no rows at
    // all) covers nothing beyond the cursor window — the bounded-
    // rewrite property
    added.size should be <= 1
    added.foreach(_.buckets.subsetOf(window) shouldBe true)
    // older segments now exclude exactly their window overlap
    store.liveSegments.filter(s => preCycle(s.nonce)).foreach { s =>
      s.excl shouldBe (s.buckets & window)
    }
    store.read().select("id").collect().map(_.getLong(0)).sorted shouldBe
      before

    // a full cycle (8 buckets / K=2 -> 3 more steps) retires every
    // pre-cycle segment; value identity still holds
    (0 until 3).foreach(_ => store.compactStep())
    store.liveSegments.map(_.nonce).toSet.intersect(preCycle) shouldBe empty
    store.read().select("id").collect().map(_.getLong(0)).sorted shouldBe
      before
    store.close()
  }
}
