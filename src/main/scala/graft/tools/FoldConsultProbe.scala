package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.streaming.FoldStore

/** Decomposes the streaming legs' per-batch index-consult cost as a
  * function of LIVE SEGMENT COUNT — the variable the r12 compaction
  * scheme controls. The embed ledger showed batch time growing
  * ~0.13 s per live segment at fixed row count growth, so this probe
  * holds everything constant except segment count and splits the
  * consult into its three driver-visible phases:
  *
  *   - `plan`: `spark.read.parquet` datasource creation — file listing
  *     (InMemoryFileIndex over segments × pk dirs) + analysis;
  *   - `scan`: a full `count()` over the store (footer opens + row
  *     decode across all live files);
  *   - `consult`: `readFor(all buckets)` followed by the join shape the
  *     legs run (broadcast anti-join + aggregate) — the real per-batch
  *     read.
  *
  * Usage: runMain graft.tools.FoldConsultProbe [rowsPerSeg] [segCounts]
  * e.g. 10000 1,5,10,20,40. Rows are embed-shaped (64-double array +
  * norm + ids) so bytes-per-row match the worst leg.
  */
object FoldConsultProbe {

  def main(args: Array[String]): Unit = {
    val rowsPerSeg = args.headOption.map(_.toInt).getOrElse(10000)
    val segCounts = args.drop(1).headOption.getOrElse("1,5,10,20,40")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val parts = 64
    def rows(lo: Long, n: Int) =
      spark.range(lo, lo + n, 1, 8)
        .map(i => (i, graft.EmbedIngestBench.vecFor(i)))
        .toDF("vec_id", "emb")
        .withColumn("norm", sqrt(aggregate(col("emb"), lit(0.0),
          (a, x) => a + x * x)))
        .withColumn("centroid_id", pmod(col("vec_id"), lit(997L)))
        .withColumn("pk", FoldStore.pk(parts, col("centroid_id")))

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    val out = segCounts.map { segs =>
      val dir = Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "fold-probe")
      val store = FoldStore.open(spark, dir.resolve("ix").toString,
        rows(0, rowsPerSeg), parts, compactAfter = 1000000)
      (1 until segs).foreach { s =>
        store.append(rows(s.toLong * rowsPerSeg, rowsPerSeg), s.toLong)
      }
      // warm nothing: each phase timed cold per segment count, then a
      // second plan+consult pass to show the warm (same-JVM) cost
      val (tPlan, df) = timed(store.read())
      val (tScan, n) = timed(df.count())
      val batch = rows(9000000L, rowsPerSeg / 10)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      batch.count()
      val pks = batch.select(col("pk")).distinct()
        .collect().map(_.getInt(0)).toSeq
      val (tConsult, _) = timed {
        val pruned = store.readFor(pks)
        val ids = batch.select(col("vec_id")).distinct()
        pruned.join(broadcast(ids), Seq("vec_id"), "left_anti")
          .groupBy(col("centroid_id")).count().count()
      }
      val (tConsult2, _) = timed {
        val pruned = store.readFor(pks)
        val ids = batch.select(col("vec_id")).distinct()
        pruned.join(broadcast(ids), Seq("vec_id"), "left_anti")
          .groupBy(col("centroid_id")).count().count()
      }
      batch.unpersist()
      store.close()
      val files = {
        val s = Files.walk(dir)
        try s.filter(_.getFileName.toString.endsWith(".parquet")).count()
        finally s.close()
      }
      {
        val s = Files.walk(dir)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { Files.deleteIfExists(p); () })
        finally s.close()
      }
      f"""{"segs":$segs,"rows":$n,"files":$files,"plan":$tPlan%.2f,""" +
        f""""scan":$tScan%.2f,"consult":$tConsult%.2f,""" +
        f""""consult2":$tConsult2%.2f}"""
    }
    println(out.mkString("[", ",", "]"))
    spark.stop()
  }
}
