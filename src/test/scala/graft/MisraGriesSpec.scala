package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.MisraGries
import graft.ops.TextHash

/** Misra-Gries guarantee against exact counts: with k counters over N
  * items, every item with true frequency > N/k survives, and reported
  * counts are lower bounds within N/k — under any partitioning (the
  * surviving SET may vary with encounter order; the guarantee may not).
  */
class MisraGriesSpec extends AnyFunSuite with Matchers with TestSpark {

  private def hitters(df: DataFrame, colName: String, k: Int)
      : Map[String, Long] =
    df.agg(MisraGries.heavyHitters(col(colName), k).as("hh"))
      .head.getSeq[Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("k larger than the domain: counts are exact") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"))
    val exact = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = hitters(ev, "event_type", k = exact.size + 5)
    got shouldBe exact
  }

  test("token stream: the N/k guarantee holds under any partitioning") {
    val toks = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(TextHash.words(col("text"))).as("tok"))
    val n = toks.count()
    val k = 20
    val exact = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = n / k
    Seq(toks.repartition(3), toks.repartition(13)).foreach { stream =>
      val got = hitters(stream, "tok", k)
      got.size should be <= (k - 1)
      // completeness: every true heavy hitter survives
      exact.filter(_._2 > bound).keySet.foreach { hot =>
        withClue(s"heavy hitter '$hot' missing: ") {
          got.contains(hot) shouldBe true
        }
      }
      // soundness: reported counts are lower bounds within N/k
      got.foreach { case (item, c) =>
        val t = exact(item)
        withClue(s"'$item' reported $c vs true $t: ") {
          c should be <= t
          (t - c) should be <= bound
        }
      }
    }
  }
}
