package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{TextAnalysis, TextDedup}
import graft.streaming.StreamGate

/** Streaming ingest gate (decontamination + Gopher rules): batch parity
  * by value across micro-batches, zero streaming state, benchmark gram
  * frame derived once.
  */
class StreamGateSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables.load(spark, dir, "documents")
    .select("doc_id", "text")
  private def benchmark = docs.filter(col("doc_id") % 97 === 0)

  private def keyRows(df: DataFrame): Map[Long, Seq[Any]] =
    df.collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
      r.toSeq).toMap

  test("gate verdicts across a 3-batch arrival == one batch pass: " +
      "decontamination counts and Gopher verdicts value-identical") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val bg = StreamGate.benchmarkGrams(benchmark,
      TextDedup.ContamGramSynthetic)
    try {
      // single-pass truth from the BATCH operators over the full corpus
      val truth = keyRows(StreamGate.gateBatch(docs, bg))
      truth should not be empty

      val all = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      val waves = all.grouped(math.max(1, all.length / 3 + 1)).toSeq
      waves.size should be >= 2 // the parity claim needs >1 micro-batch

      val in = MemoryStream[(Long, String)]
      val streamed = in.toDF().toDF("doc_id", "text")
      val got = scala.collection.mutable.Map[Long, Seq[Any]]()
      val q = StreamGate.gateSink(streamed, bg) { (annotated, _) =>
        keyRows(annotated).foreach { case (k, v) => got(k) = v }
      }.start()
      try {
        waves.foreach { w => in.addData(w.toSeq); q.processAllAvailable() }
      } finally q.stop()

      got.keySet shouldBe truth.keySet
      got.foreach { case (k, v) => v shouldBe truth(k) }
    } finally bg.unpersist()
  }

  test("the gate flags exactly the docs the batch decontaminate flags, " +
      "and admits only Gopher-keep AND clean docs") {
    val bg = StreamGate.benchmarkGrams(benchmark,
      TextDedup.ContamGramSynthetic)
    try {
      val out = StreamGate.gateBatch(docs, bg)
      val flagged = out.filter(col("n_shared_grams") > 0)
        .select("doc_id", "n_shared_grams").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batchContam = TextDedup.decontaminate(docs, benchmark,
        TextDedup.ContamGramSynthetic).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      flagged shouldBe batchContam
      flagged should not be empty

      val keepSet = TextAnalysis.gopherRules(docs)
        .filter(col("keep")).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      val admitted = out.filter(col("admit")).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      admitted shouldBe (keepSet -- flagged.keySet)
    } finally bg.unpersist()
  }

  test("gopherStream on a streaming frame: same verdict columns as the " +
      "batch rules, no state operator in the streaming plan") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val truth = keyRows(TextAnalysis.gopherRules(docs))

    val in = MemoryStream[(Long, String)]
    val out = StreamGate.gopherStream(in.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("gopher_gate")
      .outputMode("append").start()
    try {
      in.addData(docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
      q.processAllAvailable()
      // append mode with no watermark/aggregation IS the no-state proof:
      // a stateful plan would have required update/complete or a watermark
      keyRows(spark.table("gopher_gate")) shouldBe truth
    } finally q.stop()
  }
}
