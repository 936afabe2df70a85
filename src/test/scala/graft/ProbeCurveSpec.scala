package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{EmbedPq, EmbedSim}
import graft.Tables

/** Diagnostic: true-neighbor coverage of the probed inverted lists as a
  * function of probe count — the recall CEILING any IVF-composed path can
  * reach (quantization can only lose more).
  */
class ProbeCurveSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  test("probe-coverage curve on the isotropic corpus") {
    val exact = EmbedSim.knnBrute(spark, dir)
      .select("query_id", "neighbor_id").cache()
    val nTrue = exact.count()
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("norm",
        sqrt(graft.functions.DotProduct(col("emb"), col("emb"))))
    val cents = EmbedSim.ivfCentroids(spark, dir)
    val assigned = EmbedSim.kmeansAssign(spark, dir, Some(cents))
      .select(col("vec_id"), col("centroid_id")).cache()
    val queries = emb.filter(col("vec_id") % EmbedSim.QueryMod === 0)
    val wP = Window.partitionBy(col("query_id"))
      .orderBy(desc("_qc"), col("centroid_id"))
    val ranked = queries
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"),
        col("norm").as("qnorm"))
      .join(broadcast(cents), lit(true))
      .withColumn("_qc",
        round(graft.functions.DotProduct(col("qemb"), col("cemb")) /
          (col("qnorm") * col("cnorm")), 6))
      .withColumn("_rn", row_number().over(wP))
      .cache()
    def coverage(p: Int): Double = {
      val probes = ranked.filter(col("_rn") <= p)
        .select(col("query_id"), col("centroid_id"))
      val cov = exact
        .join(assigned, exact("neighbor_id") === assigned("vec_id"))
        .join(probes, Seq("query_id", "centroid_id"), "left_semi").count()
      cov.toDouble / nTrue
    }
    Seq(2, 3, 4, 5, 6, 8).foreach(p =>
      info(f"probes=$p coverage=${coverage(p)}%.3f"))
    info(s"centroids=${cents.count()}")
    // the chosen IVF-PQ probe budget must leave ceiling headroom above
    // the 0.90 recall floor for the measured ~0.04 quantization loss —
    // if the corpus or centroid training changes, this re-derives the
    // budget instead of letting the floor silently sag
    coverage(EmbedPq.IvfPqProbes) should be >= 0.94
  }
}
