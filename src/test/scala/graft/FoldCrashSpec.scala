package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.FoldStore

/** Crash-window fault injection for the durable [[FoldStore]] (VERDICT
  * r11 §next-2): for each window of the publish → manifest-swap → sweep
  * discipline, construct the exact on-disk state a death in that window
  * leaves behind, then prove open() serves precisely the committed
  * state and a replayed batch re-folds exactly once. Windows:
  *
  *  1. death AFTER a segment publish, BEFORE the manifest swap — the
  *     orphan directory is swept, the fold is not visible, and the
  *     replayed batch (id still above lastFoldedId) folds again;
  *  2. death MID manifest write — a torn/empty MANIFEST falls back to
  *     MANIFEST.bak (the previous committed state);
  *  3. death MID-COMPACTION, after the rewrite slice published but
  *     before the manifest swap — the slice is an orphan, the old
  *     segments still serve, value identity holds;
  *  4. death AFTER a compaction's manifest swap, BEFORE the grace sweep
  *     — retired directories linger but are unreferenced; open() sweeps
  *     them and serves the post-compaction state;
  *  5. `.tmp-` debris from any interrupted write is swept;
  *  6. death before the FIRST commit (torn manifest, no .bak) — the
  *     store seeds fresh instead of serving garbage.
  */
class FoldCrashSpec extends AnyFunSuite with Matchers with TestSpark {

  private def rows(ids: Long*) = {
    import spark.implicits._
    ids.toDF("id")
      .withColumn("h", col("id") * 7)
      .withColumn("pk", FoldStore.pk(8, col("h")))
  }

  private def tmp() = Files.createTempDirectory("foldcrash").toString

  private def ids(store: FoldStore): Array[Long] =
    store.read().select("id").collect().map(_.getLong(0)).sorted

  private def copySegDir(dir: String, from: String, to: String): Unit = {
    val src = Paths.get(dir, "data", s"seg=$from")
    val dst = Paths.get(dir, "data", s"seg=$to")
    Files.walk(src).forEach { p =>
      val rel = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(rel)
      else Files.copy(p, rel, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  test("window 1: segment published, manifest unswapped — the orphan " +
      "is invisible and swept; the replayed batch folds exactly once") {
    val dir = tmp()
    val store = FoldStore.open(spark, dir, rows(1, 2), prefixParts = 8)
    store.append(rows(10), 0L)
    val committed = ids(store)
    // the crash: batch 1's segment reached data/ but the manifest never
    // swapped (same state as a copy of an existing segment dir under a
    // nonce the manifest does not reference)
    val someSeg = store.liveSegments.head.nonce
    copySegDir(dir, someSeg, "9999-crashed")
    store.simulateCrash()

    val reopened = FoldStore.open(spark, dir, fail("no reseed"),
      prefixParts = 8)
    reopened.lastFoldedId shouldBe 0L
    ids(reopened) shouldBe committed // the orphan's rows are NOT served
    Files.exists(Paths.get(dir, "data", "seg=9999-crashed")) shouldBe false
    // the replay: batch 1 re-delivers and folds exactly once
    reopened.append(rows(20), 1L)
    ids(reopened) shouldBe (committed :+ 20L).sorted
    reopened.close()
  }

  test("windows 2 + 5: torn MANIFEST (power loss mid-write) falls back " +
      "to MANIFEST.bak — the previous committed state — and .tmp debris " +
      "is swept; the lost fold replays once") {
    val dir = tmp()
    val store = FoldStore.open(spark, dir, rows(1, 2), prefixParts = 8)
    store.append(rows(10), 0L) // state A -> .bak after the next write
    val stateA = ids(store)
    store.append(rows(11), 1L) // state B's manifest will be torn
    store.simulateCrash()
    // the crash: MANIFEST truncated to zero bytes mid-write; tmp debris
    Files.writeString(Paths.get(dir, "MANIFEST"), "")
    Files.createDirectories(Paths.get(dir, ".tmp-man-junk"))

    val reopened = FoldStore.open(spark, dir, fail("no reseed"),
      prefixParts = 8)
    reopened.lastFoldedId shouldBe 0L // state A, from the .bak
    ids(reopened) shouldBe stateA
    Files.exists(Paths.get(dir, ".tmp-man-junk")) shouldBe false
    // batch 1 replays (its id is above the recovered guard) — exactly
    // the at-least-once contract: the lost fold lands once
    reopened.append(rows(11), 1L)
    ids(reopened) shouldBe (stateA :+ 11L).sorted
    reopened.lastFoldedId shouldBe 1L
    reopened.close()
  }

  test("window 3: death mid-compaction (rewrite slice published, " +
      "manifest unswapped) — the slice is an unreferenced orphan, the " +
      "pre-compaction segments serve, value identity holds") {
    val dir = tmp()
    val store = FoldStore.open(spark, dir, rows(1L to 16L: _*),
      prefixParts = 8, compactAfter = 100, compactBuckets = 2)
    (0 until 3).foreach(b => store.append(rows(100L + b), b.toLong))
    val committed = ids(store)
    val liveBefore = store.liveSegments.map(_.nonce).toSet
    // the crash state: a bucket-slice segment reached data/ but the
    // exclusion manifest never swapped — identical on disk to any other
    // published-but-unreferenced directory
    copySegDir(dir, liveBefore.head, "7777-midcompact")
    store.simulateCrash()

    val reopened = FoldStore.open(spark, dir, fail("no reseed"),
      prefixParts = 8, compactAfter = 100, compactBuckets = 2)
    ids(reopened) shouldBe committed
    Files.exists(Paths.get(dir, "data", "seg=7777-midcompact")) shouldBe false
    // and the compaction simply re-runs on the recovered state
    reopened.compactStep()
    ids(reopened) shouldBe committed
    reopened.close()
  }

  test("window 4: death after a compaction's manifest swap but before " +
      "the grace sweep — retired directories linger unreferenced; " +
      "open() sweeps them and serves the post-compaction state") {
    val dir = tmp()
    val store = FoldStore.open(spark, dir, rows(1L to 16L: _*),
      prefixParts = 8, compactAfter = 100, compactBuckets = 8)
    (0 until 2).foreach(b => store.append(rows(100L + b), b.toLong))
    val committed = ids(store)
    // one full-window step retires every prior segment in one swap;
    // simulateCrash abandons the pending grace sweep, so the retired
    // dirs are still on disk but unreferenced by the new manifest
    val preStep = store.liveSegments.map(_.nonce).toSet
    store.compactStep()
    store.liveSegments.map(_.nonce).toSet.intersect(preStep) shouldBe empty
    store.simulateCrash()
    preStep.foreach { n =>
      Files.exists(Paths.get(dir, "data", s"seg=$n")) shouldBe true
    }

    val reopened = FoldStore.open(spark, dir, fail("no reseed"),
      prefixParts = 8, compactAfter = 100, compactBuckets = 8)
    ids(reopened) shouldBe committed
    preStep.foreach { n =>
      Files.exists(Paths.get(dir, "data", s"seg=$n")) shouldBe false
    }
    reopened.close()
  }

  test("window 6: death before the first commit (torn manifest, no " +
      ".bak) — open() seeds fresh rather than serving garbage") {
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "MANIFEST"), "v2\nnot-a-number")
    Files.createDirectories(Paths.get(dir, "data", "seg=halfwritten"))

    val store = FoldStore.open(spark, dir, rows(1, 2, 3), prefixParts = 8)
    ids(store) shouldBe Array(1L, 2, 3)
    store.lastFoldedId shouldBe -1L
    Files.exists(Paths.get(dir, "data", "seg=halfwritten")) shouldBe false
    store.close()
  }
}
