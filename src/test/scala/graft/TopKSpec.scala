package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.plans.TopK

/** The custom TopKPerKey operator must return exactly the window
  * row_number rows, plan through the custom physical exec (partial +
  * final around one exchange), and never sort whole groups.
  */
class TopKSpec extends AnyFunSuite with Matchers with TestSpark {

  private def orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")

  test("matches window row_number semantics exactly") {
    val custom = TopK.perKey(orders, Seq("o_custkey"),
        Seq(TopK.desc("o_totalprice"), TopK.asc("o_orderkey")), k = 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("o_custkey"), desc("o_totalprice"), col("o_orderkey"))
      .collect()
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("o_custkey"), desc("o_totalprice"), col("o_orderkey"))
      .collect()
    custom.length shouldBe viaWindow.length
    custom.zip(viaWindow).foreach { case (a, b) => a shouldBe b }
  }

  test("plans as partial+final TopKPerKeyExec around one exchange") {
    val df = TopK.perKey(orders, Seq("o_custkey"),
      Seq(TopK.desc("o_totalprice")), 2)
    val plan = df.queryExecution.executedPlan.toString
    // nodes render without the Exec suffix: partial (true) below the
    // exchange, final (false) above
    "TopKPerKey ".r.findAllIn(plan).length shouldBe 2
    plan should include("Exchange hashpartitioning(o_custkey")
    plan should not include "Sort " // no per-group sort anywhere
  }

  test("k larger than any group returns everything") {
    val all = TopK.perKey(orders, Seq("o_custkey"),
      Seq(TopK.desc("o_totalprice"), TopK.asc("o_orderkey")), k = 100000)
    all.count() shouldBe orders.count()
  }

  test("works with multi-column keys and ascending order") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val custom = TopK.perKey(df, Seq("l_returnflag", "l_linestatus"),
        Seq(TopK.asc("l_extendedprice"), TopK.asc("l_orderkey"),
          TopK.asc("l_linenumber")), 5)
      .select("l_returnflag", "l_linestatus", "l_extendedprice")
      .collect().groupBy(r => (r.getString(0), r.getString(1)))
    custom.values.foreach(_.length shouldBe 5)
    custom.keySet.size shouldBe 6
  }
}
