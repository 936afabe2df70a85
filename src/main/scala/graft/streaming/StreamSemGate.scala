package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Streaming SEMANTIC decontamination gate: every arriving embedding is
  * scored against the eval-benchmark vectors ON ARRIVAL and flagged if
  * its nearest benchmark neighbor clears the contamination threshold —
  * the embedding-space sibling of [[StreamGate]]'s gram gate, catching
  * paraphrased eval leakage the exact-gram stream check cannot see
  * (same split as the batch pair q_decontaminate / q_decontaminate_sem).
  *
  * Statelessness is the design constraint, and it rules out the batch
  * plan verbatim: [[graft.ops.EmbedSim.semAnnotate]]'s broadcast cross
  * join needs a per-vector argmax GROUPING, and a streaming aggregation
  * demands a watermark and holds state until it closes — the gate must
  * instead answer per row, at arrival. So the benchmark is collected
  * ONCE into an executor-resident index (a real eval suite is small and
  * fixed — the same broadcast-sized contract the batch path states; a
  * benchmark too big for memory would hold an ANN index per executor
  * instead) and shipped via a Spark broadcast, and the argmax runs as a
  * per-row fold inside a deterministic `Dataset.map`: one scan, zero
  * streaming state, survives any micro-batch slicing.
  *
  * Value identity with the batch operator is arithmetic, not asserted:
  * the fold computes the SAME sequential-order dot product as the native
  * [[graft.functions.DotProduct]] (ascending index, one accumulator),
  * the same `Math.sqrt` norms, the same HALF_UP 6dp quantization Spark's
  * `round` applies to doubles, and the same (max cosine, min bench_id)
  * tie rule as the batch `max_by` struct — so streamed annotations are
  * bit-identical to [[graft.ops.EmbedSim.semAnnotate]]'s, which
  * `StreamSemGateSpec` pins across a 3-batch arrival.
  *
  * Precondition (enforced, matching the batch operator): every
  * embedding — benchmark and arriving — must have norm > 0. Under the
  * engine's ANSI session default the batch cosine division throws
  * DIVIDE_BY_ZERO on a zero-norm vector; the gate throws the same class
  * of error at index build ([[benchIndex]]) and per row ([[annotate]])
  * instead of silently emitting bench_id = -1 / contaminated = false.
  */
object StreamSemGate {

  final case class SemHit(vec_id: Long, bench_id: Long, bench_cos: Double,
      contaminated: Boolean)

  /** Executor-resident benchmark index: ids ascending, embeddings and
    * precomputed L2 norms aligned by position.
    */
  final class SemBenchIndex private[StreamSemGate] (
      private[streaming] val ids: Array[Long],
      private[streaming] val embs: Array[Array[Double]],
      private[streaming] val norms: Array[Double]) extends Serializable

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    // ascending-index accumulation — the exact summation order of the
    // native DotProduct expression, so doubles match bit-for-bit
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Spark's `round(double, 6)`: decimal-string BigDecimal, HALF_UP.
    * NaN / ±Infinity pass through like Spark's round (BigDecimal.valueOf
    * would throw on them).
    */
  private def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Build the benchmark index from a STATIC (bench_id, bemb) frame —
    * eval suites are files, not streams. One driver-side collect of the
    * broadcast-sized benchmark (the gate's analogue of
    * [[StreamGate.benchmarkGrams]]'s one-time gram materialization);
    * norms are computed here with the same arithmetic the batch column
    * `sqrt(dot(bemb, bemb))` evaluates.
    */
  def benchIndex(bench: DataFrame): SemBenchIndex = {
    require(!bench.isStreaming,
      "the benchmark side of a semantic gate must be static")
    val rows = bench.select(col("bench_id"), col("bemb"))
      .orderBy("bench_id").collect()
    val ids = rows.map(_.getLong(0))
    val embs = rows.map(_.getSeq[Double](1).toArray)
    val norms = embs.map(e => Math.sqrt(dot(e, e)))
    // zero-norm precondition, enforced where the batch operator enforces
    // it: under the engine's ANSI session default, semAnnotate's cosine
    // division throws DIVIDE_BY_ZERO on a zero-norm vector — a silent
    // bench_id=-1 here would diverge from that contract
    norms.zip(ids).foreach { case (n, id) =>
      require(n > 0, s"zero-norm benchmark embedding bench_id=$id: " +
        "cosine is undefined (the batch semAnnotate rejects it too)")
    }
    new SemBenchIndex(ids, embs, norms)
  }

  /** Annotate a (vec_id, emb) frame — streaming or batch — with its
    * nearest benchmark neighbor: (vec_id, bench_id, bench_cos,
    * contaminated). Stateless per-row map; append-mode legal with no
    * watermark. Ties on the quantized cosine resolve to the smallest
    * bench_id, matching the batch `max_by(struct(cos, -bench_id))`.
    */
  def annotate(docs: DataFrame, idx: SemBenchIndex,
      threshold: Double = graft.ops.EmbedSim.SemThreshold): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(idx)
    docs.select(col("vec_id"), col("emb"))
      .as[(Long, Seq[Double])]
      .map { case (vecId, embSeq) =>
        val ix = bc.value
        val emb = embSeq.toArray
        val norm = Math.sqrt(dot(emb, emb))
        // fail fast like the batch operator: under the engine's ANSI
        // session default semAnnotate's cosine division throws
        // DIVIDE_BY_ZERO on a zero-norm vector — silently emitting
        // bench_id=-1/contaminated=false here would let exactly the
        // rows with no usable embedding through the gate unflagged
        if (!(norm > 0)) throw new IllegalArgumentException(
          s"zero-norm embedding vec_id=$vecId: cosine is undefined " +
            "(the batch semAnnotate rejects it too under ANSI division)")
        var bestId = -1L
        var bestCos = Double.NegativeInfinity
        var i = 0
        // ascending bench_id: a strictly-greater test makes the smallest
        // id win quantized-cosine ties. "Greater" replicates Spark SQL's
        // total order (NaN above every double) so that an Inf/Inf = NaN
        // edge (astronomic magnitudes; zero norms are excluded above)
        // resolves the way the batch max_by would, not silently never.
        @inline def gt(a: Double, b: Double): Boolean =
          a > b || (a.isNaN && !b.isNaN)
        while (i < ix.ids.length) {
          val c = round6(dot(emb, ix.embs(i)) / (norm * ix.norms(i)))
          if (gt(c, bestCos)) { bestCos = c; bestId = ix.ids(i) }
          i += 1
        }
        SemHit(vecId, bestId, bestCos,
          bestCos >= threshold || bestCos.isNaN)
      }
      .toDF()
  }
}
