package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** Sketch guarantees against exact aggregation on real data: CMS never
  * undercounts and overshoots by <= eps*N; HLL++ lands within its
  * configured relative error band on every group.
  */
class SketchesSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.01"

  test("CMS point estimates: never under, bounded over") {
    val ev = Tables.events(spark, dir).select(col("user_id"))
    val n = ev.count()
    val sketch = Sketches.cms(ev, "user_id")
    val exact = ev.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slack = math.ceil(Sketches.CmsEps * n).toLong
    exact.foreach { case (uid, trueCount) =>
      val est = Sketches.cmsEstimate(sketch, uid)
      withClue(s"user $uid: est $est vs true $trueCount: ") {
        est should be >= trueCount
        est should be <= trueCount + slack
      }
    }
  }

  test("HLL++ distinct-user estimates stay inside the error band") {
    val out = Sketches.approxDistinct(
      Tables.events(spark, dir), "event_type", "user_id").collect()
    out.length should be > 0
    out.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      val err = math.abs(approx - exact).toDouble / math.max(exact, 1L)
      // 3-sigma band on the configured relative standard deviation
      withClue(s"${r.get(0)}: approx $approx vs exact $exact: ") {
        err should be <= 3 * Sketches.HllRsd
      }
    }
  }

  test("sketch merge is distribution-safe: estimate is partition-stable") {
    val ev = Tables.events(spark, dir).select(col("user_id"))
    val s1 = Sketches.cms(ev.repartition(4), "user_id")
    val s2 = Sketches.cms(ev.repartition(17), "user_id")
    // fixed seed + associative merge => the SAME sketch regardless of
    // partitioning (what lets it ride any shuffle topology at 100 TB)
    val probe = ev.distinct().limit(20).collect().map(_.getLong(0))
    probe.foreach { uid =>
      Sketches.cmsEstimate(s1, uid) shouldBe Sketches.cmsEstimate(s2, uid)
    }
  }

  test("approx percentiles: rank error within n/accuracy on every group") {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"))
    val out = Sketches.approxPercentiles(ev, "event_type", "value")
    // rank of the approximate quantile among the group's exact values
    // must sit within n/accuracy of the target rank p*n
    val values = ev.collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    out.collect().foreach { r =>
      val (et, n) = (r.getString(0), r.getLong(3))
      val approx = r.getSeq[Double](1)
      val sortedVals = values(et)
      Seq(0.5, 0.9, 0.99).zipWithIndex.foreach { case (p, i) =>
        val rank = sortedVals.count(_ <= approx(i))
        val tol = n.toDouble / Sketches.PctAccuracy + 1
        withClue(s"$et p=$p: ") {
          math.abs(rank - p * n) should be <= tol
        }
      }
    }
  }
}
