package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.streaming.Warehouse

/** Z-order clustered layout: interleave correctness, and the layout
  * property that motivates it — under a Z-order write, tight range
  * filters on EITHER dimension concentrate their matches in a strict
  * subset of files, while a linear (a-major) sort only clusters the
  * leading key (a b-filter touches essentially every file).
  */
class ZorderSpec extends AnyFunSuite with Matchers with TestSpark {

  test("zorder2 interleaves bits (hand-checked values)") {
    import spark.implicits._
    // a=0b11, b=0b01 -> z = a1 b1 a0 b0 = 1 0 1 1 = 11
    // a=0b10, b=0b11 -> z = 1 1 0 1 = 13
    val out = Seq((3L, 1L), (2L, 3L), (0L, 0L), (1023L, 1023L))
      .toDF("a", "b")
      .select(Warehouse.zorder2(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    out shouldBe Array(11L, 13L, 0L, (1L << 20) - 1)
  }

  test("z-order clusters BOTH dimensions; linear sort only the leading") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("hourIdx",
        expr("unix_micros(ts) div 3600000000").bitwiseAND(lit(1023L)))
    val nFiles = 16
    val base = Files.createTempDirectory("graft-zorder")

    Warehouse.zorderWrite(ev, base.resolve("z").toString,
      col("user_id"), col("hourIdx"), numPartitions = nFiles)
    // the a-major comparison layout: range partition + sort on user_id
    ev.repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("hourIdx"))
      .write.mode("overwrite").parquet(base.resolve("lin").toString)

    def filesTouched(path: String, cond: org.apache.spark.sql.Column) = {
      val df = spark.read.parquet(path)
      (df.filter(cond).select(input_file_name()).distinct().count(),
        df.select(input_file_name()).distinct().count())
    }
    // data-driven tight filters (~10-20% selectivity each): sf0.001 has
    // only 15 distinct users and ~720 distinct (wrapped) hour indexes
    val userCut = ev.select(expr("percentile(user_id, 0.15)")).head.getDouble(0)
    val hourCut = ev.select(expr("percentile(hourIdx, 0.10)")).head.getDouble(0)
    val userCond = col("user_id") <= lit(userCut)
    val hourCond = col("hourIdx") <= lit(hourCut)

    val (zUser, zTotal) = filesTouched(base.resolve("z").toString, userCond)
    val (zHour, _) = filesTouched(base.resolve("z").toString, hourCond)
    val (lUser, lTotal) = filesTouched(base.resolve("lin").toString, userCond)
    val (lHour, _) = filesTouched(base.resolve("lin").toString, hourCond)

    info(s"z-order: user-filter $zUser/$zTotal files, " +
      s"hour-filter $zHour/$zTotal; linear: $lUser/$lTotal, $lHour/$lTotal")
    // the linear layout serves the leading key well...
    lUser.toDouble / lTotal should be <= 0.5
    // ...but a trailing-key filter touches (essentially) everything
    lHour.toDouble / lTotal should be >= 0.9
    // z-order serves BOTH: each filter concentrates in a strict subset
    zUser.toDouble / zTotal should be <= 0.7
    zHour.toDouble / zTotal should be <= 0.7
  }
}
