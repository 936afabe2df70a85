package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.ops.EmbedSim
import graft.streaming.{ParquetSink, StreamEmbedDedup}

/** Streaming embedding-ingest benchmark: drives the semantic-dedup leg
  * ([[graft.streaming.StreamEmbedDedup]]: file replay → assign to frozen
  * centroids → SemDeDup verdicts against the standing IVF assignment →
  * verdict sink → kept-vector fold) at firehose volume and reports
  * sustained vectors/second, per-batch seconds (the flatness evidence —
  * per-batch cost must be assignment-dominated, constant per batch, not
  * index-growth-dominated), keep/drop counts, planted recall, and the
  * final index size.
  *
  * Same harness discipline as [[MediaIngestBench]]: batch files staged
  * up front (parquet, float-array vectors), atomically moved into the
  * watched dir, tmpfs scratch when available. Workload: ~10% of
  * arriving vectors are perturbed copies of a standing vector (+0.002
  * per coordinate — cosine ≈ 0.99999 against the base, the
  * "re-embedded near-copy in today's crawl" case; the perturbation is
  * kept well inside the base's Voronoi cell because a copy that lands
  * across a cluster boundary is invisible to SemDeDup BY CONTRACT —
  * within-cluster dedup is the algorithm, batch and streaming alike —
  * and planted recall should measure the leg, not that known
  * property), the rest genuinely new splitmix
  * vectors (pairwise cosine concentrates near 0 at dim 64, so
  * background ≥ 0.9 near-dups are vanishingly rare); the standing index
  * and the frozen coarse centroids come from a synthetic base corpus of
  * [[StandingVectors]] vectors trained once, pre-timer.
  *
  * Usage: runMain graft.EmbedIngestBench [nVectors] [nBatches]
  * [standing]. Emits one JSON line (plus embed_bench_out.json).
  */
object EmbedIngestBench {

  val Dim = 64
  val StandingVectors = 20000

  /** Deterministic splitmix vector for id i: coordinates in
    * [-0.5, 0.5), ~uniform, so pairwise cosines of unrelated ids
    * concentrate near 0 (sd ≈ 1/sqrt(Dim)).
    */
  private[graft] def vecFor(i: Long): Array[Double] = {
    val out = new Array[Double](Dim)
    var k = 0
    while (k < Dim) {
      var z = (i * Dim + k + 1) * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      out(k) = (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
      k += 1
    }
    out
  }

  /** Arriving vector i: every 10th a perturbed copy of standing vector
    * (i/10) % standing (cos ≈ 0.99999 — must be dropped against it),
    * the rest fresh vectors keyed far from the standing id range.
    */
  private[graft] def arrivalFor(i: Long, standing: Int): Array[Double] =
    if (i % 10 == 0) vecFor((i / 10) % standing).map(_ + 0.002)
    else vecFor(1000000000L + i)

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val nStanding = args.drop(2).headOption.map(_.toInt)
      .getOrElse(StandingVectors)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val shm = Paths.get("/dev/shm")
    val base = if (Files.isWritable(shm))
      Files.createTempDirectory(shm, "graft-embedbench")
    else Files.createTempDirectory("graft-embedbench")
    val stage = Files.createDirectory(base.resolve("stage"))
    val watch = Files.createDirectory(base.resolve("in"))

    // the standing corpus + its frozen trained centroids — built once,
    // pre-timer (the "train once, amortize over ingest" contract)
    val standing = spark.range(0, nStanding.toLong, 1, 8)
      .map(i => (i, vecFor(i)))
      .toDF("vec_id", "emb")
      .withColumn("norm", sqrt(EmbedSim.dot(col("emb"), col("emb"))))
      .persist()
    val seedMod = EmbedSim.centroidMod(nStanding.toLong)
    val seeds = standing.filter(col("vec_id") % seedMod === 0)
      .select(col("vec_id").as("centroid_id"), col("emb").as("cemb"),
        col("norm").as("cnorm"))
    val centroids = EmbedSim.trainedCentroids(standing, seeds)
      .persist()
    val nCentroids = centroids.count()
    val standingAssigned = EmbedSim.assignTo(standing, centroids)

    // stage every batch up front: parquet part files of (vec_id,
    // embedding, ts) — vector generation runs distributed, pre-timer
    val batchSize = n / nBatches
    val newBase = 10000000L
    def writeBatch(b: Int, lo: Long, hi: Long): Path = {
      val dir = stage.resolve(f"batch$b%05d")
      spark.range(lo, hi, 1, 8)
        .map { i => (newBase + i,
          arrivalFor(i, nStanding).map(_.toFloat),
          new java.sql.Timestamp(1704100000000L + i * 100L)) }
        .toDF("vec_id", "embedding", "ts")
        .write.parquet(dir.toString)
      dir
    }
    val warmup = writeBatch(-1, n.toLong + 1000000L, n.toLong + 1001000L)
    val staged = (0 until nBatches).map { b =>
      writeBatch(b, b.toLong * batchSize, (b + 1).toLong * batchSize)
    }
    def release(dir: Path): Unit = {
      val s = Files.list(dir)
      try s.iterator().forEachRemaining { p =>
        if (p.getFileName.toString.endsWith(".parquet"))
          Files.move(p, watch.resolve(
            dir.getFileName.toString + "-" + p.getFileName),
            StandardCopyOption.ATOMIC_MOVE)
      } finally s.close()
    }

    val verdictDir = base.resolve("verdicts").toString
    val sink = new ParquetSink(verdictDir, maxFiles = 8)
    val leg = StreamEmbedDedup(sink, centroids, standingAssigned,
      base.resolve("index").toString)
    val q = leg.start(
      spark.readStream
        .schema("vec_id LONG, embedding ARRAY<FLOAT>, ts TIMESTAMP")
        .parquet(watch.toString),
      base.resolve("ck").toString)

    release(warmup)
    q.processAllAvailable()
    // sampled AFTER the warmup batch folds, so index_end - index_start
    // covers exactly the timed stream's growth
    val indexSize0 = leg.indexSize
    val t0 = System.nanoTime()
    val batchSec = staged.map { p =>
      val b0 = System.nanoTime()
      release(p)
      q.processAllAvailable()
      (System.nanoTime() - b0) / 1e9
    }
    val sec = (System.nanoTime() - t0) / 1e9
    q.stop()

    val verdicts = spark.read.parquet(verdictDir)
      .filter(col("vec_id") >= newBase && col("vec_id") < newBase + n)
      .persist()
    val nV = verdicts.count()
    val nDrop = verdicts.filter(!col("keep")).count()
    val planted = verdicts.filter((col("vec_id") - newBase) % 10 === 0)
    val nPlanted = planted.count()
    val nPlantedDropped = planted.filter(!col("keep")).count()
    val vps = n / sec
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    val line = s"""{"metric":"embed_ingest_throughput","value":$vps,""" +
      s""""unit":"vectors/sec","vectors":$n,"batches":$nBatches,""" +
      s""""standing":$nStanding,"centroids":$nCentroids,""" +
      s""""seconds":$sec,"median_batch_sec":${median(batchSec)},""" +
      f""""median_batch_first_half":${median(batchSec.take(batchSec.size / 2))}%.2f,""" +
      f""""median_batch_second_half":${median(batchSec.drop(batchSec.size / 2))}%.2f,""" +
      s""""verdicts":$nV,"dropped":$nDrop,""" +
      s""""planted":$nPlanted,"planted_dropped":$nPlantedDropped,""" +
      s""""index_start":$indexSize0,"index_end":${leg.indexSize},""" +
      s""""batch_seconds":${batchSec.map(t => f"$t%.2f").mkString("[", ",", "]")}}"""
    Files.writeString(Paths.get("embed_bench_out.json"), line)
    println(line)
    leg.close()
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
  }
}
