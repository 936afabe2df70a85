package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.streaming.{ParquetSink, StreamTextDedup}

/** Streaming standing-index text-dedup benchmark: drives the text leg
  * ([[graft.streaming.StreamTextDedup]]: file replay → scan-side MinHash
  * signatures → banded consult of the durable standing index → exact
  * jaccard verify → verdict sink → canonical fold) at firehose volume
  * and reports sustained documents/second, per-batch seconds (the
  * flatness evidence), dup counts, planted recall, and index growth.
  *
  * Same harness discipline as [[MediaIngestBench]] / [[EmbedIngestBench]]:
  * batch files staged up front, atomically moved in, tmpfs scratch.
  * Workload: ~10% of arriving docs are near-copies of a STANDING
  * document ([[CurationBench.mkText]] of the standing id plus a one-word
  * tail — shingle jaccard ≈ 0.9, the "curated history re-crawled" case
  * the in-window [[graft.streaming.StreamNearDup]] cannot see), the rest
  * genuinely new docs (disjoint splitmix content words). The generator's
  * every-11th boilerplate doc (one identical 8-word string, ~1.8k copies
  * in the standing corpus and ~8k arriving) is a deliberate stressor:
  * its band buckets exceed MaxBucket in the STANDING index, so the
  * hot-band cap suppresses the whole clique — measured dups == planted
  * exactly, the boilerplate absorbed instead of reported as ~8k
  * spurious matches (the cap doing precisely its designed job). The
  * standing index seeds from [[StandingDocs]] generated documents.
  *
  * Usage: runMain graft.TextIngestBench [nDocs] [nBatches] [standing].
  * Emits one JSON line (plus text_bench_out.json).
  */
object TextIngestBench {

  val StandingDocs = 20000

  /** Arriving doc i: every 10th a near-copy of standing doc
    * (i/10) % standing, the rest fresh content keyed far from the
    * standing id range (CurationBench's splitmix word generator — two
    * unrelated docs share almost no shingles).
    */
  private[graft] def textFor(i: Long, standing: Int): String =
    if (i % 10 == 0)
      CurationBench.mkText((i / 10) % standing) + " recrawled"
    else CurationBench.mkText(1000000000L + i)

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val nStanding = args.drop(2).headOption.map(_.toInt)
      .getOrElse(StandingDocs)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val shm = Paths.get("/dev/shm")
    val base = if (Files.isWritable(shm))
      Files.createTempDirectory(shm, "graft-textbench")
    else Files.createTempDirectory("graft-textbench")
    val stage = Files.createDirectory(base.resolve("stage"))
    val watch = Files.createDirectory(base.resolve("in"))

    val standing = spark.range(0, nStanding.toLong, 1, 8)
      .map(i => (i, CurationBench.mkText(i)))
      .toDF("doc_id", "text")

    val batchSize = n / nBatches
    val newBase = 10000000L
    def writeBatch(b: Int, lo: Long, hi: Long): Path = {
      val dir = stage.resolve(f"batch$b%05d")
      spark.range(lo, hi, 1, 8)
        .map { i => (newBase + i, textFor(i, nStanding),
          new java.sql.Timestamp(1704100000000L + i * 100L)) }
        .toDF("doc_id", "text", "ts")
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
    val leg = StreamTextDedup(sink, standing,
      base.resolve("index").toString, spark)
    val q = leg.start(
      spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
        .parquet(watch.toString),
      base.resolve("ck").toString)

    release(warmup)
    q.processAllAvailable()
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
      .filter(col("doc_id") >= newBase && col("doc_id") < newBase + n)
      .persist()
    val nV = verdicts.count()
    val nDup = verdicts.filter(col("is_dup")).count()
    val nNoSig = verdicts.filter(!col("has_sig")).count()
    val planted = verdicts.filter((col("doc_id") - newBase) % 10 === 0)
    // planted recrawls whose STANDING target is the boilerplate clique
    // are absorbed by the hot-band cap BY CONTRACT (the batch tier's
    // incremental operator misses them identically — the clique's band
    // buckets exceed MaxBucket in the standing index); r11's apparent
    // 100% recall on them was an artifact of within-batch dup copies
    // accreting into the index and matching later copies, the exact
    // accretion the r12 fold dedup closes — so they are reported as
    // their own absorbed bucket, not blended into recall
    val isBoiler =
      (((col("doc_id") - newBase) / 10).cast("long") % nStanding) % 11 === 3
    val contentful = planted.filter(!isBoiler)
    val nPlanted = planted.count()
    val nContentful = contentful.count()
    val nContentfulFound = contentful.filter(col("is_dup")).count()
    val nBoiler = nPlanted - nContentful
    val nBoilerFound = planted.filter(isBoiler)
      .filter(col("is_dup")).count()
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    val line = s"""{"metric":"text_ingest_throughput",""" +
      s""""value":${n / sec},"unit":"docs/sec","docs":$n,""" +
      s""""batches":$nBatches,"standing":$nStanding,""" +
      s""""seconds":$sec,"median_batch_sec":${median(batchSec)},""" +
      f""""median_batch_first_half":${median(batchSec.take(batchSec.size / 2))}%.2f,""" +
      f""""median_batch_second_half":${median(batchSec.drop(batchSec.size / 2))}%.2f,""" +
      s""""verdicts":$nV,"dups":$nDup,"no_sig":$nNoSig,""" +
      s""""planted":$nPlanted,"planted_contentful":$nContentful,""" +
      s""""planted_contentful_found":$nContentfulFound,""" +
      s""""planted_boilerplate_absorbed":$nBoiler,""" +
      s""""planted_boilerplate_found":$nBoilerFound,""" +
      s""""index_start":$indexSize0,"index_end":${leg.indexSize},""" +
      s""""batch_seconds":${batchSec.map(t => f"$t%.2f").mkString("[", ",", "]")}}"""
    Files.writeString(Paths.get("text_bench_out.json"), line)
    println(line)
    leg.close()
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
  }
}
