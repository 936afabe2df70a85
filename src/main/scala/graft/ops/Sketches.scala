package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-sketch surface — the cardinality/frequency estimators a
  * 100 TB pipeline leans on when exact distinct/frequency tables stop
  * fitting anywhere (vocabulary of a web crawl, user cardinality of an
  * event firehose).
  *
  * Both are Spark-native aggregates (codegen'd, partial/final merge —
  * the sketch property is exactly that partial states merge
  * associatively, so they ride the normal two-phase shuffle):
  *  - HyperLogLog++ via `approx_count_distinct` (relative-error knob);
  *  - Count-min via `count_min_sketch` (eps/confidence knobs), probed
  *    with the engine-side [[cmsEstimate]] reader.
  *
  * Sketches are NOT oracle-paired: DuckDB's approx_distinct is a
  * different sketch with different estimates, and hash-exact compare of
  * estimators is meaningless. The correctness surface is their
  * mathematical guarantee, pinned in SketchesSpec against exact
  * aggregation on real data: CMS estimates are NEVER under the true
  * count and overshoot by at most eps·N at the configured confidence;
  * HLL++ lands within its configured relative error.
  */
object Sketches {

  val CmsEps = 0.01 // overcount bound: eps * total items
  val CmsConfidence = 0.99
  val CmsSeed = 42 // fixed seed: deterministic sketch across reruns
  val HllRsd = 0.05 // HLL++ max relative standard deviation

  /** Per-group approximate distinct (HLL++) beside the exact count —
    * the inspection shape used to validate the estimator before
    * trusting it where exact counting is impossible.
    */
  def approxDistinct(df: DataFrame, group: String, value: String)
      : DataFrame =
    df.groupBy(col(group))
      .agg(
        approx_count_distinct(col(value), HllRsd).as("approx_distinct"),
        countDistinct(col(value)).as("exact_distinct"))
      .orderBy(group)

  /** The corpus frequency sketch: one binary CMS over `value`. */
  def cms(df: DataFrame, value: String): Array[Byte] =
    df.agg(count_min_sketch(col(value), lit(CmsEps), lit(CmsConfidence),
      lit(CmsSeed)).as("s")).head.getAs[Array[Byte]](0)

  /** Point estimate from a serialized CMS (driver-side probe; the
    * sketch itself is built distributed).
    */
  def cmsEstimate(sketch: Array[Byte], item: Any): Long = {
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketch))
    cms.estimateCount(item)
  }

  /** approx_percentile's accuracy knob: rank error <= 1/accuracy of the
    * group size (Greenwald-Khanna style mergeable summary — the quantile
    * member of the sketch tier; like CMS/HLL it rides the normal
    * partial/final shuffle with bounded state per group).
    */
  val PctAccuracy = 100

  /** Per-group approximate percentiles beside the exact ones — the same
    * validate-the-estimator inspection shape as [[approxDistinct]]. The
    * guarantee (pinned in SketchesSpec): the approximate p-quantile's
    * RANK lies within n/PctAccuracy of rank p·n, for every group and
    * every requested p.
    */
  def approxPercentiles(df: DataFrame, group: String, value: String,
                        ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val pArr = array(ps.map(lit): _*)
    df.groupBy(col(group))
      .agg(
        approx_percentile(col(value), pArr, lit(PctAccuracy))
          .as("approx_pct"),
        expr(s"percentile($value, array(${ps.mkString(",")}))")
          .as("exact_pct"),
        count(col(value)).as("n"))
      .orderBy(group)
  }
}
