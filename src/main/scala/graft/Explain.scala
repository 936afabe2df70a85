package graft

/** Dev tool: dump formatted physical plans for the headline queries —
  * the SURVEY-mandated plan review (pushdown, broadcast, shuffle count).
  * Usage: runMain graft.Explain [sfDir] [query...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val which = if (args.length > 1) args.drop(1).toSet else
      Set("q1_pricing", "q3_shipping", "q_region_revenue", "q_hourly_stats",
        "q_dedup_events", "q_minhash_pairs", "q_knn_brute", "q_top_quality")
    val spark = Sessions.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.filter(q => which(q._1)).foreach { case (name, fn) =>
      println(s"\n========== $name ==========")
      fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
