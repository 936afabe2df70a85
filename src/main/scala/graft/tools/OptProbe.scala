package graft.tools

import org.apache.spark.sql.DataFrame

/** Optimization-round scratch probe: per-query phase breakdown
  * (plan-build / analyze / optimize / physical-plan / execute) over a
  * comma-separated query list — separates driver-side planning latency
  * from execution, which a tiny-SF bench otherwise conflates (guide §1:
  * decide WHERE the time goes before touching anything). Same session
  * config and timed action as Bench (toRdd.count over the compiled plan).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.OptProbe q_a,q_b"
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val which = args.headOption.map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("q_dedup_clusters"))
    val passes = sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    graft.Queries.warmup(spark, sfDir)
    val sc = spark.sparkContext
    val names = graft.SparkEntry.queries.keys.filter(which).toSeq.sorted
    names.foreach { n => // one warm pass (JIT + codegen)
      graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
    }
    for (pass <- 1 to passes; n <- names) {
      var df: DataFrame = null
      val tBuild = t { df = graft.SparkEntry.queries(n)(spark, sfDir) }
      val tAna = t { df.queryExecution.analyzed }
      val tOpt = t { df.queryExecution.optimizedPlan }
      val tPhys = t { df.queryExecution.executedPlan }
      sc.setJobDescription(s"$n pass=$pass")
      val tExec = t { df.queryExecution.toRdd.count() }
      sc.setJobDescription(null)
      println(f"[probe] $n%-28s pass=$pass build=$tBuild%6.3f ana=$tAna%6.3f " +
        f"opt=$tOpt%6.3f phys=$tPhys%6.3f exec=$tExec%6.3f " +
        f"total=${tBuild + tAna + tOpt + tPhys + tExec}%6.3f")
    }
    graft.Queries.clear()
    spark.stop()
  }
}
