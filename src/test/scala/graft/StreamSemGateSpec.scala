package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.EmbedSim
import graft.streaming.StreamSemGate

/** Streaming semantic decontamination gate: per-row scorer bit-identical
  * to the batch broadcast-join argmax, batch parity across micro-batches,
  * zero streaming state.
  */
class StreamSemGateSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.01"

  private def isBench = (col("vec_id") % EmbedSim.SemBenchMod === 0) &&
    (col("vec_id") < 100000)

  private def corpusAll = EmbedSim.dupCorpus(spark, dir)

  private def benchFrame = corpusAll.filter(isBench)
    .select(col("vec_id").as("bench_id"), col("emb").as("bemb"))

  private def key(df: DataFrame): Map[Long, (Long, Double, Boolean)] =
    df.collect().map(r => r.getLong(r.fieldIndex("vec_id")) ->
      ((r.getLong(r.fieldIndex("bench_id")),
        r.getDouble(r.fieldIndex("bench_cos")),
        r.getBoolean(r.fieldIndex("contaminated"))))).toMap

  test("gate scorer is BIT-identical to the batch broadcast argmax " +
      "(same dot order, same sqrt, same HALF_UP 6dp, same tie rule)") {
    val truth = key(EmbedSim.decontaminateSemantic(spark, dir))
    truth should not be empty
    // the planted perturbed copies exist in this corpus, so both sides
    // of the threshold are exercised
    truth.values.count(_._3) should be > 0
    truth.values.count(!_._3) should be > 0

    val idx = StreamSemGate.benchIndex(benchFrame)
    val got = key(StreamSemGate.annotate(
      corpusAll.filter(!isBench).select("vec_id", "emb"), idx))
    got.keySet shouldBe truth.keySet
    got.foreach { case (v, ann) => withClue(s"vec $v: ") {
      ann shouldBe truth(v) // Double == Double: bit-level agreement
    }}
  }

  test("zero-norm embeddings fail fast on BOTH paths (batch throws " +
      "ANSI DIVIDE_BY_ZERO; the gate must not silently emit bench_id=-1)") {
    import spark.implicits._
    val goodBench = Seq((10L, Seq(1.0, 1.0)), (30L, Seq(0.0, 1.0)))
      .toDF("bench_id", "bemb")
      .withColumn("bnorm", sqrt(EmbedSim.dot(col("bemb"), col("bemb"))))
    val zeroCorpus = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0)))
      .toDF("vec_id", "emb")
      .withColumn("norm", sqrt(EmbedSim.dot(col("emb"), col("emb"))))
    // the batch contract under the engine's ANSI session default: a
    // zero-norm vector is an ERROR, not a row with NaN annotations
    val batchErr = intercept[Exception] {
      EmbedSim.semAnnotate(zeroCorpus, goodBench).collect()
    }
    batchErr.getMessage should include("DIVIDE_BY_ZERO")

    // gate, corpus side: same fail-fast (wrapped in Spark's task
    // failure), with the offending vec_id named
    val idx = StreamSemGate.benchIndex(goodBench.select("bench_id", "bemb"))
    val gateErr = intercept[Exception] {
      StreamSemGate.annotate(zeroCorpus.select("vec_id", "emb"), idx)
        .collect()
    }
    gateErr.toString + Option(gateErr.getCause).mkString should
      include("zero-norm")

    // gate, benchmark side: rejected at index build
    val zeroBench = Seq((10L, Seq(1.0, 1.0)), (20L, Seq(0.0, 0.0)))
      .toDF("bench_id", "bemb")
    val benchErr = intercept[IllegalArgumentException] {
      StreamSemGate.benchIndex(zeroBench)
    }
    benchErr.getMessage should include("bench_id=20")
  }

  test("3-batch streaming arrival == one batch pass, with ZERO " +
      "streaming state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val truth = key(EmbedSim.decontaminateSemantic(spark, dir))
    val idx = StreamSemGate.benchIndex(benchFrame)

    val all = corpusAll.filter(!isBench).select("vec_id", "emb")
      .as[(Long, Seq[Double])].collect()
    val waves = all.grouped(math.max(1, all.length / 3 + 1)).toSeq
    waves.size should be >= 2

    val in = MemoryStream[(Long, Seq[Double])]
    val streamed = in.toDF().toDF("vec_id", "emb")
    val q = StreamSemGate.annotate(streamed, idx)
      .writeStream.format("memory").queryName("semgate")
      .outputMode("append").start()
    try {
      waves.foreach { w => in.addData(w.toSeq); q.processAllAvailable() }
      val got = key(spark.table("semgate"))
      got.keySet shouldBe truth.keySet
      got.foreach { case (v, ann) => ann shouldBe truth(v) }
      // stateless by construction: no state operators in the progress
      val progress = q.lastProgress
      progress.stateOperators shouldBe empty
    } finally q.stop()
  }
}
