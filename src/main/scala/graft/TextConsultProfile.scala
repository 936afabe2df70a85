package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.TextDedup
import graft.streaming.{FoldStore, StreamTextDedup}

/** Per-stage decomposition of the streaming text leg's standing-index
  * consult (VERDICT r11 item 5: at ~1,025 docs/s the leg is ~10× slower
  * per item than the gate-only pipeline, attributed to the banding +
  * jaccard-verify consult with no stage evidence). One micro-batch is
  * pushed through the leg's exact stages, each materialized from a
  * persisted predecessor so a stage's wall time is ITS work alone:
  *
  *  1. `signature` — scan-side MinHash + shingle hashes + band explode
  *     ([[StreamTextDedup.sigRows]]);
  *  2. `prune_read` — the FoldStore partition-pruned index read for the
  *     batch's touched pk buckets;
  *  3. `band_join`  — touched-band semi-join + hot-band cap + candidate
  *     (indexed_id, new_id) pairs;
  *  4. `verify`     — exact shingle-jaccard on candidates + per-doc best
  *     match reduction;
  *  5. `within_dedup` — the fold's within-batch dedup: exact-hash
  *     collapse + banded near-dup pairing among representatives;
  *  6. `fold_append`  — canonical-row append (segment publish +
  *     manifest swap, incl. any compaction step).
  *
  * Run: runMain graft.TextConsultProfile [standing] [batch] [reps].
  * Emits one JSON line (plus text_consult_profile.json).
  */
object TextConsultProfile {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val nStanding = args.headOption.map(_.toInt).getOrElse(100000)
    val nBatch = args.drop(1).headOption.map(_.toInt).getOrElse(10000)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ixDir = Files.createTempDirectory("consult-prof").toString
    val standing = spark.range(0, nStanding.toLong, 1, 8)
      .map(i => (i, CurationBench.mkText(i)))
      .toDF("doc_id", "text")
    val store = FoldStore.open(spark, ixDir,
      StreamTextDedup.sigRows(standing)
        .withColumn("pk", FoldStore.pk(StreamTextDedup.PrefixParts,
          col("band"))),
      StreamTextDedup.PrefixParts)

    // the TextIngestBench arrival mix: ~10% near-copies of standing
    // docs, the rest genuinely new; each rep gets a DISJOINT id/content
    // range so earlier reps' folds don't inflate later reps' stages
    def mkBatch(rep: Int): DataFrame = {
      val lo = rep.toLong * nBatch
      val b = spark.range(lo, lo + nBatch, 1, 8)
        .map(i => (10000000L + i, TextIngestBench.textFor(i, nStanding)))
        .toDF("doc_id", "text")
        .persist(StorageLevel.MEMORY_AND_DISK)
      b.count()
      b
    }

    def run(batch: DataFrame): Map[String, Double] = {
      var t = Map.empty[String, Double]
      def stage[A](name: String)(f: => A): A = {
        val (a, s) = timed(f); t += name -> s; a
      }

      val fresh = StreamTextDedup.sigRows(batch)
        .persist(StorageLevel.MEMORY_AND_DISK)
      stage("signature")(fresh.count())

      val pks = fresh
        .select(FoldStore.pk(StreamTextDedup.PrefixParts, col("band")))
        .distinct().collect().map(_.getInt(0)).toSeq
      val pruned = store.readFor(pks)
        .select(col("doc_id"), col("band"), col("shingles"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      stage("prune_read")(pruned.count())

      val index = pruned.join(
        broadcast(fresh.select(col("doc_id")).distinct()),
        Seq("doc_id"), "left_anti")
      // candidates only (cap + band join), verification split out: the
      // same subtree incrementalDupsFromBands runs, stopped before the
      // jaccard compute so the two stages price separately
      val touched = index.join(
        broadcast(fresh.select(col("band")).distinct()),
        Seq("band"), "leftsemi")
      val okBands = touched.groupBy(col("band"))
        .agg(count(lit(1)).as("_n"))
        .filter(col("_n") <= TextDedup.MaxBucket)
        .select(col("band"))
      val cand = fresh.as("f")
        .join(touched.join(okBands, "band").as("ix"), "band")
        .select(col("ix.doc_id").as("indexed_id"),
          col("f.doc_id").as("new_id"),
          col("ix.shingles").as("_sa"), col("f.shingles").as("_sb"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      stage("band_join")(cand.count())

      val best = cand
        .groupBy(col("indexed_id"), col("new_id"))
        .agg(first(col("_sa")).as("_sa"), first(col("_sb")).as("_sb"))
        .withColumn("jaccard",
          size(array_intersect(col("_sa"), col("_sb"))) /
            size(array_union(col("_sa"), col("_sb"))))
        .filter(col("jaccard") >= 0.5)
        .groupBy(col("new_id").as("doc_id"))
        .agg(min(struct((-col("jaccard")).as("_nj"),
          col("indexed_id"))).as("m"))
        .select(col("doc_id"), col("m.indexed_id").as("matched_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      stage("verify")(best.count())

      // the leg's within-batch fold dedup: exact-hash collapse, then
      // banded near-dup pairing among the representatives only
      val withinDup = stage("within_dedup") {
        val w = StreamTextDedup.withinBatchDups(fresh, 0.5)
          .persist(StorageLevel.MEMORY_AND_DISK)
        w.count()
        w
      }

      stage("fold_append") {
        val keep = fresh
          .join(best.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .join(broadcast(withinDup), Seq("doc_id"), "left_anti")
        store.append(keep.withColumn("pk",
          FoldStore.pk(StreamTextDedup.PrefixParts, col("band"))),
          store.lastFoldedId + 1)
      }
      withinDup.unpersist()

      best.unpersist(); cand.unpersist(); pruned.unpersist()
      fresh.unpersist()
      t
    }

    val all = (0 until reps).map { r =>
      val b = mkBatch(r)
      try run(b) finally { b.unpersist(); () }
    }
    val stages = Seq("signature", "prune_read", "band_join", "verify",
      "within_dedup", "fold_append")
    def med(name: String): Double = {
      val xs = all.map(_(name)).sorted; xs(xs.size / 2)
    }
    val total = stages.map(med).sum
    val line = s"""{"metric":"text_consult_profile","unit":"sec",""" +
      s""""standing":$nStanding,"batch":$nBatch,"reps":$reps,""" +
      stages.map(s =>
        f""""$s%s":${med(s)}%.3f""").mkString(",") +
      f""","total":$total%.3f}"""
    Files.writeString(java.nio.file.Paths.get("text_consult_profile.json"),
      line)
    println(line)
    store.close()
    spark.stop()
  }
}
