package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway decomposition probe for the optimization round: times
  * labelled subplans of whichever operator is under the knife (edited in
  * place per experiment, like Profile). Not part of any query path.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[T] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit = { df.queryExecution.toRdd.count(); () }

    val li = graft.ops.Par.fanOut(graft.Tables.load(spark, dir, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_quantity",
        "l_partkey", "l_suppkey"), key = "l_extendedprice")
    val keyStats = li.groupBy("l_returnflag")
      .agg(count(col("l_extendedprice")).as("n_p"),
        count(col("l_quantity")).as("n_q"),
        min(col("l_extendedprice")).as("mn_p"),
        max(col("l_extendedprice")).as("mx_p"),
        min(col("l_quantity")).as("mn_q"),
        max(col("l_quantity")).as("mx_q"),
        count_distinct(col("l_partkey")).as("n_parts_c"),
        count_distinct(col("l_suppkey")).as("n_supps_c"))
    val keyStatsNoDistinct = li.groupBy("l_returnflag")
      .agg(count(col("l_extendedprice")).as("n_p"))
    val exploded = li.select(col("l_returnflag"), explode(array(
        struct(lit("p").as("kind"), col("l_extendedprice").as("vd")),
        struct(lit("q").as("kind"), col("l_quantity").as("vd")))).as("e"))
      .select(col("l_returnflag"), col("e.kind").as("kind"), col("e.vd").as("vd"))
      .filter(col("vd").isNotNull)
    for (i <- 1 to 3) {
      t("scan")(noop(li))
      t("keyStats (2 distinct)")(noop(keyStats))
      t("keyStats no distinct")(noop(keyStatsNoDistinct))
      t("exploded p/q")(noop(exploded))
      val full = graft.ops.Relational.priceStats(spark, dir)
      t("full query")(noop(full))
      if (i == 3) {
        val fin = full.queryExecution.executedPlan.toString
        println("[plan] ReusedExchange: " + "ReusedExchange".r.findAllIn(fin).length)
        println("[plan] Scan parquet: " + "Scan parquet".r.findAllIn(fin).length)
        println("[plan] Expand: " + "Expand".r.findAllIn(fin).length)
        println("[plan] Generate: " + "Generate".r.findAllIn(fin).length)
      }
    }
    spark.stop()
  }
}
