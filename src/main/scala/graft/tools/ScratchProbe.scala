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

    import graft.ops._
    def tm(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[T] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (i <- 1 to 3)
      tm(s"ann build $i")(
        Clean.annotate(Reviews.docsAsReviews(graft.Tables.load(spark, dir,
          "documents"))).queryExecution.toRdd.count())
    spark.stop()
  }
}
