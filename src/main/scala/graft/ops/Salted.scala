package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigating salted join (SURVEY §4 / 100 TB charter: "skewed keys ->
  * salting or AQE skew-join"). AQE's skew-join split handles most cases at
  * runtime; explicit salting is the plan-level tool when one build-side key
  * dominates a shuffle join:
  *
  *   left (skewed, large):  key -> (key, salt = pmod(hash(tiebreaker), S))
  *   right (smaller):       replicated S times, once per salt value
  *
  * The join key becomes (key, salt), spreading a hot key over S shuffle
  * partitions; the right side grows by S× (bounded — it's the smaller
  * side). Result set is identical to the unsalted join (proved in
  * SkewSpec).
  *
  * When to reach for this instead of AQE: AQE's skew split
  * (`spark.sql.adaptive.skewJoin.enabled`) only rewrites shuffled
  * sort-merge/hash JOINS after a shuffle has materialized, so it cannot
  * help when AQE is disabled, when the skewed stage is an AGGREGATION on
  * the hot key, or when a single key exceeds
  * `spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes` inside
  * one map output that AQE cannot split further (identical join keys are
  * never separable by partition splitting — salting changes the key
  * itself, which AQE by design never does).
  */
object Salted {

  /** Equi-join left⋈right on `key`, salting the left side S ways and
    * replicating the right side. `saltSource` must be a left column with
    * per-row variance (any id/value column — only its hash matters).
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           saltSource: String, salts: Int): DataFrame =
    join(left, right, Seq(key), saltSource, salts)

  /** Composite-key variant (e.g. lmScore's (h1, hb) bigram-count join).
    * salts = 1 degenerates to the plain join (constant salt column).
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           saltSource: String, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(col(saltSource)), lit(salts)))
    val explodedRight = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(explodedRight, keys :+ "_salt").drop("_salt")
  }
}
