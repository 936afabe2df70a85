package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable, content-addressed storage for the engine's standing indexes
  * (IVF centroids, PQ codebooks/codes, the MinHash band index, dedup
  * cluster labels, the IVF corpus assignment).
  *
  * The production contracts the engine already states — "train once,
  * amortize over probe passes" for the ANN indexes, and
  * [[graft.ops.TextDedup.incrementalDups]]'s daily-increment path joining
  * a STANDING band index — both require an index that survives the JVM,
  * not just the per-session memo in [[Queries]]. This is that surface:
  * parquet save + load keyed by an order-independent content signature of
  * the frame the index was trained on, so
  *
  *  - a FRESH session (new JVM) reuses the trained index instead of
  *    retraining — exactly what a daily curation service does;
  *  - a regenerated/changed corpus changes the signature and forces a
  *    rebuild — a stale index can never be served against new data
  *    (the snapshot-versioned index layout of a real feature store);
  *  - index builds are deterministic (quantized order-independent means,
  *    md5/xxhash64 portable hashing throughout), so a loaded index is
  *    value-identical to a rebuilt one and every consumer query stays
  *    oracle-exact either way.
  *
  * Concurrency: writers build into a process-unique temp dir and publish
  * with an atomic rename; racing publishers of the same (name, signature)
  * are idempotent (first move wins, losers discard — the content is
  * identical by determinism).
  *
  * Scale shape: each persisted index is small relative to its corpus
  * (centroids/codebooks are KB; codes are M bytes/vector; the band index
  * is a skinny projection), and on a real cluster the same layout maps
  * to a shared object-store prefix. Disabled with GRAFT_INDEX=off.
  */
object IndexStore {

  /** Test hook: redirect the store root (specs point this at a temp dir
    * so they control freshness).
    */
  @volatile var rootOverride: Option[String] = None

  def enabled: Boolean =
    !sys.env.get("GRAFT_INDEX").exists(v => v == "off" || v == "0")

  def root: String = rootOverride.getOrElse(
    sys.env.getOrElse("GRAFT_INDEX_DIR",
      Paths.get(sys.props("java.io.tmpdir"), "graft-index").toString))

  /** Observability for specs and ops: how many indexes were served from
    * disk vs built this JVM.
    */
  val loads = new java.util.concurrent.atomic.AtomicLong
  val builds = new java.util.concurrent.atomic.AtomicLong

  /** Order-independent content signature of a source frame: row count +
    * xor of xxhash64 over every column. Any row added, removed, or
    * changed flips the signature; partitioning and row order cannot.
    * One cheap column-pruned scan of the (skinny) source projection.
    */
  def signature(source: DataFrame): String = {
    val cols = source.columns.map(col).toSeq
    val row = source
      .select(xxhash64(cols: _*).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"))
      .head()
    f"${row.getLong(0)}%x-${row.getLong(1)}%016x"
  }

  private def indexDir(name: String, sig: String): Path =
    Paths.get(root, s"$name-$sig")

  /** Serve the index for (name, signature-of-source) from disk, building
    * and publishing it first if this corpus snapshot has never been
    * indexed. Always returns the DISK copy so first-build and reuse
    * sessions read byte-identical data.
    */
  def loadOrBuild(spark: SparkSession, name: String, source: DataFrame)
                 (build: => DataFrame): DataFrame = {
    if (!enabled) return build
    val sig = signature(source)
    val dir = indexDir(name, sig)
    if (!Files.exists(dir.resolve("_SUCCESS"))) {
      builds.incrementAndGet()
      Files.createDirectories(Paths.get(root))
      val tmp = Paths.get(root,
        s".tmp-$name-$sig-${ProcessHandle.current.pid}-${System.nanoTime}")
      build.write.mode("overwrite").parquet(tmp.toString)
      try Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.AccessDeniedException |
             _: java.nio.file.DirectoryNotEmptyException =>
          // a racing publisher won; our build is identical — discard it
          deleteRecursively(tmp)
      }
    } else loads.incrementAndGet()
    spark.read.parquet(dir.toString)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(deleteRecursively(_))
    Files.deleteIfExists(p)
    ()
  }
}
