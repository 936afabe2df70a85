package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.schema.RawReview
import graft.streaming.{Pipeline, UpsertSink}

/** Streaming-topology throughput benchmark: drives the full E1->E2->E3
  * pipeline (dedup -> quality annotate -> route -> idempotent keyed
  * upsert + issue fan-out) over an in-memory stream and reports
  * records/second.
  *
  * The reference's configured single-node operating points are 10/100/1000
  * reviews/s with a 1-partition topology (producer.py:235-242,277-282,
  * faust_app.py:26) — its record-at-a-time interpreted path is bounded by
  * per-message sleeps and Python dispatch. This engine processes the same
  * topology in vectorized micro-batches, so the honest comparison is
  * sustained records/second through the identical operator chain.
  *
  * Usage: runMain graft.StreamBench [nRecords] [nBatches]. Emits one JSON
  * line (plus stream_bench_out.json) like Bench.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // RocksDB state store (the reference's backend, faust_app.py:25): the
    // default HDFS-backed provider clones the full in-memory state map
    // every micro-batch, so a growing dedup key set makes batch time scale
    // with TOTAL state (quadratic over the run) — RocksDB keeps batch cost
    // proportional to the DELTA, which is the only shape that survives
    // unbounded streams.
    val spark = Sessions.builder(cpus)
      .config(graft.streaming.Monitor.RocksDbConf._1,
        graft.streaming.Monitor.RocksDbConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // deterministic synthetic reviews: ~10% duplicates (dedup work), a mix
    // of accept/reject text (routing work), event-time spread over hours
    val texts = Array(
      "this place was absolutely wonderful and the staff were great",
      "terrible experience BUY NOW!!! visit http://spam.example click here",
      "ok",
      "the food was fine and the service was quick but the room was loud",
      "una experiencia muy buena con el mejor servicio de la ciudad")
    def mk(i: Int): RawReview = {
      val id = if (i % 10 == 9) i - 1 else i // every 10th is a duplicate
      RawReview(s"r$id", s"b${id % 997}", s"u${id % 4999}",
        Some(1.0 + id % 5), texts(id % texts.length),
        new Timestamp(1704100000000L + (id % 7200) * 1000L),
        Some(id % 7), Some(id % 3), Some(id % 5), "bench")
    }

    val sink = new UpsertSink("review_id")
    val issues = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.Row]()
    val in = MemoryStream[RawReview]
    val checkpoint = Files.createTempDirectory("graft-streambench").toString
    val q = new Pipeline(sink, issues).start(in.toDF(), checkpoint)

    val batchSize = n / nBatches
    // warm the topology (JIT + codegen) before timing
    in.addData((0 until 1000).map(mk))
    q.processAllAvailable()
    val t0 = System.nanoTime()
    val batchSec = (0 until nBatches).map { b =>
      val b0 = System.nanoTime()
      in.addData((1000 + b * batchSize until 1000 + (b + 1) * batchSize)
        .map(mk))
      q.processAllAvailable()
      (System.nanoTime() - b0) / 1e9
    }
    val sec = (System.nanoTime() - t0) / 1e9
    q.stop()

    val total = nBatches * batchSize
    val rps = total / sec
    val line = s"""{"metric":"stream_throughput","value":$rps,""" +
      s""""unit":"records/sec","records":$total,"batches":$nBatches,""" +
      s""""seconds":$sec,"upserted":${sink.size},""" +
      s""""issues":${issues.size},""" +
      s""""batch_seconds":${batchSec.map(t => f"$t%.2f").mkString("[", ",", "]")},""" +
      s""""reference_configured_max":1000}"""
    Files.writeString(java.nio.file.Paths.get("stream_bench_out.json"), line)
    println(line)
    spark.stop()
  }
}
