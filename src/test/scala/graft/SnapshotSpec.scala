package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Snapshot

/** Snapshot diff: status semantics on a hand fixture and churn counts
  * matching the synthetic snapshot's modular arithmetic on the real
  * corpus.
  */
class SnapshotSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.01"

  test("added / removed / changed statuses; unchanged rows dropped") {
    import spark.implicits._
    val old = Seq((1L, "alpha", "s"), (2L, "beta", "s"), (3L, "gamma", "s"))
      .toDF("doc_id", "text", "source")
    val neu = Seq((1L, "alpha", "s"), (2L, "beta2", "s"), (4L, "delta", "s"))
      .toDF("doc_id", "text", "source")
    val got = Snapshot.corpusDiff(old, neu).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    got shouldBe Map(2L -> "changed", 3L -> "removed", 4L -> "added")
    // hashes present on the sides that exist
    val rows = Snapshot.corpusDiff(old, neu).collect()
      .map(r => r.getLong(0) -> r).toMap
    rows(4L).isNullAt(1) shouldBe true
    rows(3L).isNullAt(2) shouldBe true
    rows(2L).getString(1) should not be rows(2L).getString(2)
  }

  test("synthetic snapshot churn matches its modular arithmetic and " +
      "is a small fraction of the corpus") {
    val docs = Tables.load(spark, dir, "documents")
    val byMod = (m: Int) => docs.filter(col("doc_id") % m === 0).count()
    val removed = byMod(23)
    val added = byMod(19)
    val changed = docs
      .filter(col("doc_id") % 17 === 0 && col("doc_id") % 23 =!= 0).count()
    val diff = Snapshot.corpusDiff(
      docs.select("doc_id", "text", "source"),
      Snapshot.newSnapshot(spark, dir)).collect()
    val byStatus = diff.groupBy(_.getString(3)).view.mapValues(_.length)
    byStatus.toMap shouldBe Map("removed" -> removed.toInt,
      "added" -> added.toInt, "changed" -> changed.toInt)
    // the delta is churn-sized, not corpus-sized
    diff.length.toLong should be < docs.count() / 2
  }
}
