package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the single most recent right
  * row with `right.ts <= left.ts` on the same key — the feature-store /
  * point-in-time-correctness operator Spark has no built-in for.
  *
  * Implementation is the scalable union trick, NOT a range cross join:
  * tag both sides, union, and run one window pass per key ordered by
  * (ts, right-before-left on ties) carrying the last seen right payload
  * forward (`last(..., ignoreNulls)`), then keep left rows. Cost: ONE
  * shuffle on the key + a per-key sort — the same plan shape as any
  * windowed aggregation, linear in |L|+|R|, no |L|x|R| blowup, skew
  * handled by AQE like any other window. (A range-join would be the
  * broadcast path for small R.)
  *
  * Tie semantics: a right row at exactly left.ts MATCHES (<=), emulating
  * DuckDB's ASOF JOIN (the oracle pairs q_asof with a native ASOF JOIN).
  */
object AsOfJoin {

  /** leftTs/rightTs must be the same-named ts columns; right payload
    * columns are suffixed into the output as-is. Inner as-of semantics:
    * left rows with no prior right row are DROPPED (matching DuckDB's
    * default ASOF JOIN, which matches on right-ROW existence). With
    * `inner = false` every left row survives and a `_matched` boolean marks
    * whether a prior right row existed (its payload fields may themselves
    * be null).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           payload: Seq[String], inner: Boolean = true): DataFrame = {
    val leftTagged = left.withColumn("_side", lit(1))
      .withColumns(payload.map(p => p -> lit(null).cast(
        right.schema(p).dataType)).toMap)
    val rightTagged = right
      .select((key +: ts +: payload).map(col): _*)
      .withColumn("_side", lit(0))
    val unioned = leftTagged.select(leftTagged.columns.sorted.toIndexedSeq.map(col): _*)
      .unionByName(rightTagged, allowMissingColumns = true)
    // right rows sort BEFORE left rows at the same ts (_side 0 < 1), so a
    // right row at exactly left.ts is visible to that left row
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ALL payloads ride in ONE struct that is non-null for every right row,
    // so last(ignoreNulls) carries the most recent right ROW — a right row
    // whose payload fields are null still matches (and contributes its
    // nulls), instead of per-column last() leaking an older row's values
    // forward and the inner filter dropping the row entirely.
    val carried = unioned.withColumn("_asof",
      last(when(col("_side") === 0, struct(payload.map(col): _*)),
        ignoreNulls = true).over(w))
    val joined = carried.filter(col("_side") === 1)
      .drop("_side").drop(payload: _*)
    val withPayload = payload.foldLeft(joined) { (df, p) =>
      df.withColumn(p, col("_asof").getField(p))
    }
    if (inner) withPayload.filter(col("_asof").isNotNull).drop("_asof")
    else withPayload.withColumn("_matched", col("_asof").isNotNull)
      .drop("_asof")
  }
}
