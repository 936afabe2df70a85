package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational surface over the TPC-H-style testdata (SURVEY §2.7: the
  * reference has no joins — Kafka keying by business_id is its co-partition
  * structure — so the engine's join/agg/window surface is pure Catalyst,
  * exercised here and graded by BASELINE.json's north star).
  *
  * Scale notes (100 TB):
  *  - q1Pricing: scan + partial/final hash agg on 2 low-cardinality keys;
  *    the shipdate filter and 7-column projection push into the parquet scan.
  *  - q3Shipping: customer is the small side -> Catalyst broadcasts it under
  *    the 10 MB threshold; orders⋈lineitem shuffles on the join key (both
  *    sides huge at scale). AQE handles skew.
  *  - topOrdersPerCustomer: one shuffle on o_custkey, streaming window rank,
  *    filter rank<=3 — no global sort.
  *  - regionRevenue: supplier/nation/region are dimension tables ->
  *    broadcast-hash joins all the way down; one shuffle for the final agg.
  *  - eventPropsAgg: JSON path extraction (get_json_object) + hash agg.
  * Averages/double sums are rounded so parallel summation order cannot leak
  * into compared output.
  */
object Relational {

  /** TPC-H Q1-style pricing summary. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-06-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: top-10 BUILDING-segment orders by revenue. */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  /** Window function: top-3 orders per customer by totalprice
    * (deterministic tiebreak on orderkey).
    */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rnk"))
      .orderBy("o_custkey", "rnk")
  }

  /** Star-join through the dimension chain supplier->nation->region
    * (all broadcast), revenue per region per order year.
    */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = Tables.load(spark, dir, "lineitem")
    val orders = Tables.load(spark, dir, "orders")
    val supplier = broadcast(Tables.load(spark, dir, "supplier"))
    val nation = broadcast(Tables.load(spark, dir, "nation"))
    val region = broadcast(Tables.load(spark, dir, "region"))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("yr"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "yr")
  }

  /** ROLLUP over the Q1 grouping — multi-level aggregates in one pass
    * (Catalyst expands grouping sets; one shuffle). Null grouping levels
    * are made oracle-comparable via grouping_id.
    */
  def pricingRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        grouping_id().cast("int").as("gid"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        count(lit(1)).as("n"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  /** Set operations over the events stream: users seen in clicks but never
    * in purchases (EXCEPT), plus the distinct union cardinality check cols.
    */
  def clickNoPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click").select("user_id")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id")
    clicks.except(purchases).orderBy("user_id")
  }

  /** INTERSECT: users who both clicked and purchased. */
  def clickAndPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_type") === "click").select("user_id")
      .intersect(ev.filter(col("event_type") === "purchase").select("user_id"))
      .orderBy("user_id")
  }

  /** Exact percentiles + distinct counts per group (portable: both engines
    * compute exact linear-interpolated quantiles over the sorted values;
    * approx_percentile/HLL sketches are deliberately not oracle-paired).
    */
  def priceStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 2).as("p50_price"),
        round(expr("percentile(l_extendedprice, 0.95)"), 2).as("p95_price"),
        round(expr("percentile(l_quantity, 0.5)"), 2).as("p50_qty"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")

  /** As-of join over the events stream: each click matched to the user's
    * most recent prior (or simultaneous) purchase. Right side is deduped to
    * unique (user_id, ts) so the as-of pick is deterministic in both
    * engines (DuckDB's native ASOF JOIN is the oracle).
    */
  def clickLastPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(round(max(col("value")), 2).as("purchase_value"))
    AsOfJoin.asOf(clicks, purchases, key = "user_id", ts = "ts",
        payload = Seq("purchase_value"))
      .select("event_id", "user_id", "ts", "purchase_value")
      .orderBy("event_id")
  }

  /** Semi-structured projection: extract `$.k` from the JSON props column
    * and aggregate per event_type (S1-adjacent: permissive JSON handling).
    */
  def eventPropsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).cast("long").as("sum_k"),
        round(avg(col("k")), 2).as("avg_k"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("event_type")
}
