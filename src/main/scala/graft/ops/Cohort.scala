package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weekly cohort retention over the event stream — the engagement matrix
  * behind every "do users come back?" dashboard: users are cohorted by the
  * week of their FIRST event, and each later week of activity increments
  * that cohort's retention cell at its week offset.
  *
  * Exact-arithmetic contract: week buckets come from `date_trunc('week')`
  * (Monday-anchored in both Spark and DuckDB), the offset is an integer
  * day-difference divided by 7 (exact — truncated week starts are always
  * 7k days apart), and the retention rate is ONE int/int division rounded
  * once. Offset 0 is every cohort's own week (retention ≡ 1.0 by
  * construction — kept in the output as the matrix diagonal).
  *
  * Scale shape: first-event extraction and per-week activity dedup are
  * both partial-agg groupBys keyed on user_id — the join back is
  * user-co-partitioned, so the plan pays ONE user exchange for the big
  * frame; cohort sizes collapse to |weeks| rows and broadcast onto the
  * retention cells. No window functions, no second scan of raw events.
  */
object Cohort {

  def retention(events: DataFrame): DataFrame = {
    val week = date_trunc("week", col("ts"))
    // first-ever event week per user (min over the raw stream, map-side
    // combined) — the cohort assignment
    val cohorts = events.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    // distinct active (user, week) pairs — same user-keyed exchange
    val active = events.select(col("user_id"), week.as("active_week"))
      .distinct()
    val cells = active.join(cohorts, "user_id")
      .select(col("cohort_week"),
        (datediff(col("active_week"), col("cohort_week")) / 7)
          .cast("int").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
    val sizes = cohorts.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"),
        col("n_active").cast("long").as("n_active"),
        col("cohort_size").cast("long").as("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 4)
          .as("retention"))
      .orderBy("cohort_week", "week_offset")
  }
}
