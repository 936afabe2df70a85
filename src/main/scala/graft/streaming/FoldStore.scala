package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The durable standing-index store behind the streaming dedup legs
  * ([[StreamMediaDedup]], [[StreamEmbedDedup]]): a log of immutable
  * parquet SEGMENTS governed by a single atomic MANIFEST, hash-prefix
  * partitioned so each micro-batch's index consult prunes to the files
  * that can possibly match.
  *
  * Why this exists (the three failure modes it closes):
  *
  *  - '''Durability.''' The pre-r11 leg kept fold leaves as
  *    `localCheckpoint` blocks — executor-local, gone on driver restart
  *    and unrecoverable on executor loss, so every committed batch's
  *    canonical fingerprints silently vanished on a crash and pre-crash
  *    assets re-admitted as new. Here every fold is parquet under the
  *    leg's index directory, and [[FoldStore.open]] rebuilds the live
  *    segment set and `lastFoldedId` from the manifest — restart
  *    recovery is a read of one small file.
  *  - '''Bounded plan width.''' A chain of one in-memory leaf per
  *    micro-batch made per-batch analysis cost and scan-leg count grow
  *    O(#batches) (and each leaf carried its own 32 cached partitions —
  *    task-launch overhead was the measured 3.5 → 7.1 s batch-time
  *    growth of the r10 video ledger). Here the index is read as ONE
  *    partitioned parquet datasource regardless of fold count — the file
  *    source packs small files into few tasks by `maxPartitionBytes` —
  *    and segments past [[compactAfter]] are merged into one.
  *  - '''Per-batch index scan cost.''' The consult key's hash prefix
  *    (`pk = hash(key) mod prefixParts`) is a PARTITION column, so
  *    [[readFor]] turns the arriving batch's touched-key set into a
  *    partition filter the scan prunes at FILE granularity: a
  *    micro-batch touching few buckets reads those buckets' files and
  *    nothing else, instead of semi-join-filtering rows AFTER reading
  *    the whole index. On an object store this is the inverted-list
  *    layout an IVF/LSH service keeps: one prefix = one list shard.
  *
  * Crash consistency: a segment is published by writing to a `.tmp-`
  * directory and atomically renaming it into place, then the manifest —
  * a single file, atomically rename-replaced — is updated to reference
  * it. The manifest is the sole truth: a crash between segment publish
  * and manifest write leaves an orphan directory that the next
  * [[FoldStore.open]] sweeps, and the replayed batch (its id is still
  * above the manifest's `lastFoldedId`) folds again. Compaction writes
  * the merged segment first, swaps the manifest, then deletes the
  * superseded segments — at no point can a reader of the current
  * manifest see missing or doubled rows (the same
  * publish-then-swap-then-sweep discipline as [[graft.IndexStore]]).
  *
  * Concurrency contract: ONE writer per store directory (the streaming
  * leg's `foreachBatch` calls are serialized by Spark; the class
  * additionally synchronizes its mutations). Readers in the same
  * process see the volatile segment list.
  *
  * Scale notes: folds are increment-sized, compaction is rare
  * (every [[compactAfter]] folds) and rewrites only what a year of
  * increments accumulated — a production deployment would tier the
  * merges (Lucene-style) but the write amplification at that cadence is
  * already bounded; `prefixParts` maps to the shard count of the
  * object-store prefix at deployment scale (64 here, thousands there).
  */
final class FoldStore private (spark: SparkSession, dir: Path,
    val prefixParts: Int, compactAfter: Int, schemaDdl: String) {

  @volatile private var live: Vector[String] = Vector.empty
  @volatile private var folded: Long = -1L

  /** Highest micro-batch id whose fold the manifest has committed —
    * the replay guard: a redelivered batch id <= this folds nothing.
    */
  def lastFoldedId: Long = folded

  private[graft] def segmentCount: Int = live.size

  private def dataDir: Path = dir.resolve("data")

  /** The standing index as ONE parquet datasource (constant plan width
    * however many folds are live): segments are a partition level
    * (`data/seg=<nonce>/pk=<p>/`), so the whole store is one scan with
    * the manifest's live-segment set applied as a partition filter —
    * which is also what makes a crash-orphaned segment (published but
    * never committed to the manifest) invisible to readers until the
    * next open() sweeps it.
    */
  def read(): DataFrame =
    if (live.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL(schemaDdl))
    else
      spark.read.option("basePath", dataDir.toString)
        .parquet(dataDir.toString)
        .filter(col("seg").isin(live.map(s => s: Any): _*))
        .drop("seg")

  /** The standing index restricted to the given hash-prefix buckets —
    * `pk` is a partition column, so this prunes segment FILES before
    * read, not rows after. `pks` comes from the arriving batch's keys
    * (bounded by [[prefixParts]]); an empty batch reads nothing.
    */
  def readFor(pks: Seq[Int]): DataFrame =
    if (pks.isEmpty) read().filter(lit(false))
    else read().filter(col("pk").isin(pks.map(Int.box): _*))

  /** Fold one micro-batch's rows in (no-op rows-wise when `stored` is
    * empty, but `foldId` still commits so the replay guard advances).
    * `stored` must carry the store's schema including the int `pk`
    * prefix column.
    */
  def append(stored: DataFrame, foldId: Long): Unit = synchronized {
    val seg = publishSegment(stored)
    live = live ++ seg
    folded = foldId
    writeManifest()
    if (live.size > compactAfter) compact()
  }

  /** Merge every live segment into one (bounded plan/file count for
    * long-running ingests), swap the manifest, sweep the superseded
    * segment directories.
    */
  private[streaming] def compact(): Unit = synchronized {
    val merged = read()
    val old = live
    publishSegment(merged) match {
      case Some(seg) =>
        live = Vector(seg)
        writeManifest()
        old.foreach(s => FoldStore.deleteRecursively(
          dataDir.resolve(s"seg=$s")))
      case None => // nothing stored anywhere; keep the (empty) manifest
    }
  }

  /** Distinct values of `idCol` standing in the index (diagnostic —
    * "how many canonical assets does the index know").
    */
  def assets(idCol: String): Long =
    read().select(idCol).distinct().count()

  /** Write `stored` as an immutable segment and atomically publish it
    * under `data/seg=<nonce>`; None when the frame produced no rows
    * (parquet writes no pk dirs). One file per touched pk bucket: the
    * repartition puts each bucket in exactly one task.
    */
  private def publishSegment(stored: DataFrame): Option[String] = {
    val nonce = s"${ProcessHandle.current.pid}-${System.nanoTime()}"
    val tmp = dir.resolve(s".tmp-$nonce")
    stored
      .repartition(math.min(8, prefixParts), col("pk"))
      .write.mode("overwrite").partitionBy("pk").parquet(tmp.toString)
    val hasData = FoldStore.listDir(tmp)
      .exists(_.getFileName.toString.startsWith("pk="))
    if (hasData) {
      Files.createDirectories(dataDir)
      Files.move(tmp, dataDir.resolve(s"seg=$nonce"),
        StandardCopyOption.ATOMIC_MOVE)
      Some(nonce)
    } else {
      FoldStore.deleteRecursively(tmp)
      None
    }
  }

  private def writeManifest(): Unit = {
    val tmp = dir.resolve(s".tmp-man-${System.nanoTime()}")
    Files.writeString(tmp,
      (Seq(folded.toString, schemaDdl) ++ live).mkString("\n"))
    Files.move(tmp, dir.resolve(FoldStore.ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Recovery: adopt the manifest's segment list + fold id, sweep
    * orphan segment/tmp directories a crash left behind.
    */
  private def recover(): Unit = {
    val lines = Files.readString(dir.resolve(FoldStore.ManifestName))
      .split("\n", -1).toVector
    folded = lines.head.toLong
    live = lines.drop(2).filter(_.nonEmpty)
    val referenced = live.map(s => s"seg=$s").toSet
    FoldStore.listDir(dir)
      .filter(_.getFileName.toString.startsWith(".tmp-"))
      .foreach(FoldStore.deleteRecursively)
    if (Files.isDirectory(dataDir))
      FoldStore.listDir(dataDir)
        .filterNot(p => referenced.contains(p.getFileName.toString))
        .foreach(FoldStore.deleteRecursively)
  }

  private def seed(df: DataFrame): Unit = {
    Files.createDirectories(dir)
    live = publishSegment(df).toVector
    folded = -1L
    writeManifest()
  }
}

object FoldStore {

  private val ManifestName = "MANIFEST"

  /** Open the store at `dir`, seeding it from `seed` (the initial
    * standing index, stored shape incl. the int `pk` column) only when
    * no manifest exists — a restart adopts the durable state and never
    * re-evaluates the seed frame.
    */
  def open(spark: SparkSession, dir: String, seed: => DataFrame,
      prefixParts: Int = 64, compactAfter: Int = 64): FoldStore = {
    val d = Paths.get(dir)
    if (Files.exists(d.resolve(ManifestName))) {
      val lines = Files.readString(d.resolve(ManifestName)).split("\n", -1)
      val store = new FoldStore(spark, d, prefixParts, compactAfter, lines(1))
      store.recover()
      store
    } else {
      val s = seed
      val store = new FoldStore(spark, d, prefixParts, compactAfter,
        s.schema.toDDL)
      store.seed(s)
      store
    }
  }

  /** The hash-prefix partition key for a consult key: stable across
    * sessions (xxhash64 with Spark's fixed seed), bounded by `parts`.
    */
  def pk(parts: Int, keys: org.apache.spark.sql.Column*):
      org.apache.spark.sql.Column =
    pmod(xxhash64(keys: _*), lit(parts.toLong)).cast("int")

  private def listDir(dir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq finally s.close()
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
    ()
  }
}
