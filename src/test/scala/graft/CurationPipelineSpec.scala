package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.EmbedSim
import graft.streaming.{CurationPipeline, ParquetSink, StreamGate,
  StreamNearDup, StreamSemGate, UpsertSink}

/** The composed streaming curation firehose: replay → gram/Gopher gate →
  * near-dup → semantic gate → warehouse, as ONE topology — batch parity
  * of the admitted set across micro-batch arrival, first-failing-stage
  * reject reasons, dup pairs among admitted docs, and checkpoint-restart
  * for both queries (incl. the near-dup state store).
  */
final case class CurDoc(doc_id: Long, text: String, ts: Timestamp,
    emb: Seq[Double])

class CurationPipelineSpec extends AnyFunSuite with Matchers with TestSpark {

  private val K = 3 // gram gate length (synthetic texts share few 8-grams)

  private def ts(s: String) = Timestamp.valueOf(s)

  // ≥ 50 words, stopword-rich, alpha-dominant — comfortably Gopher-green.
  // Each template's CONTENT words are disjoint from the others', so the
  // only near-dup pair in the fixture is the deliberate one (a shared
  // sentence template would make every doc pair at J ≈ 0.7).
  private def goodText(template: String): String =
    (1 to 6).map(i => template.replace("#", i.toString)).mkString(" ")

  private val textAlpha = goodText(
    "the alpha number # fox jumps over the lazy dog and it runs far " +
      "away into the quiet green field")
  private val textBeta = goodText(
    "a quiet # river flows past the old stone bridge and many birds " +
      "were singing in the cold morning air near town")
  private val textGamma = goodText(
    "an orange # lantern glows above the wooden door while wind moves " +
      "softly through the tall grass of a dark valley")
  private val textDelta = goodText(
    "this bright # machine hums beside the narrow road and its wheels " +
      "turn slowly with a steady sound in the dusty yard")

  private val benchText =
    "the canonical held out evaluation prompt that nobody may train on " +
      "because it is the benchmark"

  private def benchmark(implicit s: org.apache.spark.sql.SparkSession)
      : DataFrame = {
    import s.implicits._
    Seq((900L, benchText)).toDF("doc_id", "text")
  }

  private def semBench(implicit s: org.apache.spark.sql.SparkSession)
      : DataFrame = {
    import s.implicits._
    Seq((900L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("bench_id", "bemb")
  }

  // embeddings: e(i) orthogonal-ish to the benchmark axis
  private def emb(x: Double, y: Double, z: Double, w: Double) =
    Seq(x, y, z, w)

  private val docs = Seq(
    CurDoc(1L, textAlpha, ts("2024-01-01 10:00:00"),
      emb(0.1, 1.0, 0.0, 0.0)),
    CurDoc(2L, textBeta, ts("2024-01-01 10:01:00"),
      emb(0.0, 0.0, 1.0, 0.2)),
    // shares the benchmark's 3-grams but is otherwise Gopher-green
    CurDoc(3L, textGamma + " " + benchText,
      ts("2024-01-01 10:02:00"), emb(0.0, 0.3, 0.0, 1.0)),
    // Gopher reject: far under 50 words — FIRST failing stage wins even
    // though it also shares benchmark grams
    CurDoc(4L, "too short " + benchText, ts("2024-01-01 10:03:00"),
      emb(0.2, 0.0, 0.5, 0.0)),
    // semantically contaminated: embedding parallel to the benchmark
    // vector (cos = 1.0 ≥ 0.9) while text is clean
    CurDoc(5L, textDelta, ts("2024-01-01 10:04:00"),
      emb(2.0, 0.0, 0.0, 0.0)),
    // near-dup of doc 1 (one word differs) — admitted, then paired
    CurDoc(6L, textAlpha.replace("number 3", "number three"),
      ts("2024-01-01 10:05:00"), emb(0.1, 0.9, 0.1, 0.0)))

  private def docsDF(implicit s: org.apache.spark.sql.SparkSession)
      : DataFrame = {
    import s.implicits._
    docs.toDF()
  }

  test("rowGated ≡ gateBatch: per-row broadcast gate matches the " +
      "join/agg batch gate column for column on real data") {
    implicit val s = spark
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").limit(300)
    val cols = Seq("doc_id", "word_count", "mean_word_len", "alpha_frac",
      "stop_count", "keep", "reject_reason", "clf_mean_weight", "clf_keep",
      "n_shared_grams", "admit", "admit_clf")
    val viaBatch = StreamGate.gate(real, benchmark, K)
      .select(cols.map(col): _*).orderBy("doc_id").collect()
    val viaRow = StreamGate.rowGated(real, StreamGate.rowGateCtx(benchmark, K))
      .select(cols.map(col): _*).orderBy("doc_id").collect()
    viaRow should not be empty
    viaRow shouldBe viaBatch
  }

  test("end-to-end 3-wave arrival: admitted set equals the batch truth, " +
      "rejects name the FIRST failing stage, dup pairs surface") {
    implicit val s = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val admit = new UpsertSink("doc_key")
    val rejectDir = Files.createTempDirectory("graft-cur").resolve("rej").toString
    val dupDir = Files.createTempDirectory("graft-cur").resolve("dup").toString
    val in = MemoryStream[CurDoc]
    val checkpoint = Files.createTempDirectory("graft-cur-ckpt").toString
    val gate = StreamGate.rowGateCtx(benchmark, K)
    val sem = StreamSemGate.benchIndex(semBench)
    val (qa, qd) = new CurationPipeline(admit, new ParquetSink(rejectDir),
      new ParquetSink(dupDir)).start(in.toDF(), gate, sem, checkpoint)
    try {
      docs.grouped(2).foreach { wave =>
        in.addData(wave)
        qa.processAllAvailable(); qd.processAllAvailable()
      }
      // batch truth: gram/Gopher gate ∩ semantically clean
      val gateTruth = StreamGate.gate(docsDF, benchmark, K)
        .filter(col("admit")).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val corpus = docsDF.select(col("doc_id").as("vec_id"),
          col("emb").cast("array<double>").as("emb"))
        .withColumn("norm", sqrt(EmbedSim.dot(col("emb"), col("emb"))))
      val semClean = EmbedSim.semAnnotate(corpus,
          semBench.withColumn("bnorm",
            sqrt(EmbedSim.dot(col("bemb"), col("bemb")))))
        .filter(!col("contaminated")).select("vec_id")
        .collect().map(_.getLong(0)).toSet
      val truth = gateTruth.intersect(semClean)
      truth shouldBe Set(1L, 2L, 6L)
      import scala.jdk.CollectionConverters._
      admit.store.keySet().asScala.map(_.toLong) shouldBe truth

      val rejects = spark.read.parquet(rejectDir)
        .select("doc_id", "reject_stage")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      rejects.keySet shouldBe Set(3L, 4L, 5L)
      rejects(3L) shouldBe "benchmark_gram"
      rejects(4L) shouldBe "gopher:word_count" // first stage wins
      rejects(5L) shouldBe "benchmark_semantic"

      val pairs = spark.read.parquet(dupDir)
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs shouldBe Set((1L, 6L))
    } finally { qa.stop(); qd.stop() }
  }

  test("checkpoint restart: both queries resume; near-dup band state " +
      "survives, replays don't grow the keyed warehouse") {
    implicit val s = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val admit = new UpsertSink("doc_key")
    val rejectDir = Files.createTempDirectory("graft-cur-r").resolve("rej").toString
    val dupDir = Files.createTempDirectory("graft-cur-r").resolve("dup").toString
    val in = MemoryStream[CurDoc]
    val checkpoint = Files.createTempDirectory("graft-cur-rckpt").toString
    val gate = StreamGate.rowGateCtx(benchmark, K)
    val sem = StreamSemGate.benchIndex(semBench)
    val pipe = new CurationPipeline(admit, new ParquetSink(rejectDir),
      new ParquetSink(dupDir))

    // incarnation 1: docs 1 and 2 admitted, no dups yet
    val (qa1, qd1) = pipe.start(in.toDF(), gate, sem, checkpoint)
    try {
      in.addData(docs(0), docs(1))
      qa1.processAllAvailable(); qd1.processAllAvailable()
    } finally { qa1.stop(); qd1.stop() }
    admit.size shouldBe 2

    // incarnation 2, SAME checkpoint: doc 6 (near-dup of doc 1) can only
    // pair if the band state store was RESTORED — doc 1 lives in no
    // later batch
    val (qa2, qd2) = pipe.start(in.toDF(), gate, sem, checkpoint)
    try {
      in.addData(docs(5))
      qa2.processAllAvailable(); qd2.processAllAvailable()
      admit.size shouldBe 3
      val pairs = spark.read.parquet(dupDir)
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs shouldBe Set((1L, 6L))
    } finally { qa2.stop(); qd2.stop() }
  }
}
