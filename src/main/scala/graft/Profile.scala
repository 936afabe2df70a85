package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: where does q_clean_docs time go? */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.builder("8")
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("WSCG", "true"))
      .config("spark.sql.codegen.factoryMode", sys.env.getOrElse("FACTORY", "FALLBACK"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val df = t("build plan")(Queries.cleanDocs(spark, dir))
    t("analyze")(df.queryExecution.analyzed)
    t("optimize")(df.queryExecution.optimizedPlan)
    t("physical")(df.queryExecution.executedPlan)
    t("execute count")(println("rows=" + df.count()))
    t("execute count 2nd")(println("rows=" + df.count()))
    val issues = Queries.qualityIssues(spark, dir)
    t("issues count")(println("rows=" + issues.count()))
    spark.stop()
  }
}
