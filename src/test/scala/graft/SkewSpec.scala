package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Salted

/** Salted join must produce exactly the plain join's rows, including on a
  * pathologically skewed key distribution.
  */
class SkewSpec extends AnyFunSuite with Matchers with TestSpark {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of rows share one hot key
    val left = spark.range(0, 20000)
      .select(col("id"),
        when(col("id") % 10 < 9, lit(42L)).otherwise(col("id") % 100)
          .as("k"))
    val right = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "attr")

    val plain = left.join(right, Seq("k"))
      .select("id", "k", "attr").orderBy("id").collect()
    val salted = Salted.join(left, right, key = "k",
        saltSource = "id", salts = 8)
      .select("id", "k", "attr").orderBy("id").collect()
    salted.length shouldBe plain.length
    salted.zip(plain).foreach { case (a, b) => a shouldBe b }
  }

  test("TopK custom operator equals window on skewed random data") {
    import spark.implicits._
    // heavy ties + a hot key: the worst case for heap/tiebreak bugs
    val rnd = new scala.util.Random(7)
    val rows = (0 until 5000).map { i =>
      val key = if (rnd.nextInt(10) < 6) 1L else rnd.nextInt(50).toLong
      (i.toLong, key, rnd.nextInt(20).toDouble) // many value ties
    }
    val df = rows.toDF("id", "k", "v")
      .repartition(8) // force multi-partition partial phase
    df.cache().count()
    val custom = graft.plans.TopK.perKey(df, Seq("k"),
        Seq(graft.plans.TopK.desc("v"), graft.plans.TopK.asc("id")), k = 7)
      .select("k", "id", "v").orderBy("k", "id").collect()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      .orderBy(desc("v"), col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7).select("k", "id", "v")
      .orderBy("k", "id").collect()
    custom.length shouldBe viaWindow.length
    custom.zip(viaWindow).foreach { case (a, b) => a shouldBe b }
    df.unpersist()
  }
}
