package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The durable standing-index contract: build + publish in one session,
  * serve from DISK in a fresh session, value-identical results either
  * way; content signatures are order-independent and change-sensitive so
  * a stale index can never be served against a regenerated corpus.
  */
class IndexStoreSpec extends AnyFunSuite with Matchers with TestSpark {

  private val sf = "/root/testdata/sf0.001"

  private def withFreshRoot[A](body: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-idx").toString
    IndexStore.rootOverride = Some(dir)
    Queries.clear()
    try body
    finally { IndexStore.rootOverride = None; Queries.clear() }
  }

  test("signature is order-independent and change-sensitive") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    val b = Seq((3L, "z"), (1L, "x"), (2L, "y")).toDF("id", "v")
      .repartition(3)
    val c = Seq((1L, "x"), (2L, "y"), (3L, "Z")).toDF("id", "v")
    val d = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    IndexStore.signature(a) shouldBe IndexStore.signature(b)
    IndexStore.signature(a) should not be IndexStore.signature(c)
    IndexStore.signature(a) should not be IndexStore.signature(d)
  }

  test("signature sees even-multiplicity changes (XOR-blind case) and " +
      "empty frames") {
    import spark.implicits._
    // {A,A} -> {B,B}: count unchanged, per-row XOR self-cancels both ways —
    // only the additive power sums can tell these apart
    val aa = Seq((1L, "x"), (1L, "x")).toDF("id", "v")
    val bb = Seq((2L, "y"), (2L, "y")).toDF("id", "v")
    IndexStore.signature(aa) should not be IndexStore.signature(bb)
    // duplicating a row changes the multiset even though XOR cancels it
    val a1 = Seq((1L, "x")).toDF("id", "v")
    val a3 = Seq((1L, "x"), (1L, "x"), (1L, "x")).toDF("id", "v")
    IndexStore.signature(a1) should not be IndexStore.signature(a3)
    // empty frame: signs (not throws), and an empty index builds fine
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    noException should be thrownBy IndexStore.signature(empty)
    withFreshRoot {
      val served = IndexStore.loadOrBuild(spark, "empty", empty) {
        empty.select(col("id"), expr("length(v)").as("n"))
      }
      served.count() shouldBe 0L
    }
  }

  test("changed build params invalidate the persisted index (stale-binary " +
      "guard)") {
    withFreshRoot {
      import spark.implicits._
      val src = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
      var built = 0
      def serve(params: String) =
        IndexStore.loadOrBuild(spark, "toy", src, params) {
          built += 1
          src.select(col("doc_id"), expr("length(text)").as("n"))
        }.count()
      serve("m=4")
      serve("m=4") // same params + content: disk
      built shouldBe 1
      serve("m=8") // the r5 SubSpaces-style change: must NOT serve stale
      built shouldBe 2
    }
  }

  test("increment merge: merged index is value-identical to a full " +
      "rebuild and is served from disk on re-request") {
    withFreshRoot {
      import spark.implicits._
      val base = Seq((1L, "alpha beta"), (2L, "gamma delta"))
        .toDF("doc_id", "text")
      val inc = Seq((3L, "alpha beta"), (1L, "epsilon"))
        .toDF("doc_id", "text") // duplicate doc_id rows allowed (multiset)
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"), expr("length(text)").as("n"))
      val m0 = IndexStore.merges.get
      val merged = IndexStore.mergeOrBuild(spark, "inc", base, inc) {
        rowsOf(base)
      } { rowsOf(inc) }
      (IndexStore.merges.get - m0) shouldBe 1L
      val full = rowsOf(base.unionAll(inc))
      merged.orderBy("doc_id", "n").collect() shouldBe
        full.orderBy("doc_id", "n").collect()
      // re-request: combined signature hits — no rebuild, no re-merge
      val l0 = IndexStore.loads.get
      IndexStore.mergeOrBuild(spark, "inc", base, inc) {
        fail("base rebuilt on a served merge"): org.apache.spark.sql.DataFrame
      } { fail("increment rebuilt on a served merge"): org.apache.spark.sql.DataFrame }
        .count() shouldBe 4L
      (IndexStore.loads.get - l0) shouldBe 1L
      (IndexStore.merges.get - m0) shouldBe 1L
    }
  }

  test("two concurrent merges of different increments against the same " +
      "base: disjoint signature-addressed dirs, both value-correct, " +
      "neither increment's rows dropped") {
    withFreshRoot {
      import spark.implicits._
      import org.apache.spark.sql.DataFrame
      val base = (1L to 40L).map(i => (i, s"doc $i payload"))
        .toDF("doc_id", "text")
      val incA = (100L to 119L).map(i => (i, s"inc-a $i"))
        .toDF("doc_id", "text")
      val incB = (200L to 229L).map(i => (i, s"inc-b $i"))
        .toDF("doc_id", "text")
      def rowsOf(df: DataFrame) =
        df.select(col("doc_id"), expr("length(text)").as("n"))
      // the race: both threads see no published base index, both may
      // build it (idempotent first-publish-wins), and each publishes its
      // own merge under its own combined signature
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      def mergeWith(inc: DataFrame): Array[org.apache.spark.sql.Row] =
        IndexStore.mergeOrBuild(spark, "cmerge", base, inc) { rowsOf(base) } {
          rowsOf(inc)
        }.orderBy("doc_id").collect()
      val (gotA, gotB) = Await.result(
        Future(mergeWith(incA)).zip(Future(mergeWith(incB))), 120.seconds)
      gotA shouldBe rowsOf(base.unionAll(incA)).orderBy("doc_id").collect()
      gotB shouldBe rowsOf(base.unionAll(incB)).orderBy("doc_id").collect()
      // and both merged indexes remain independently servable afterwards
      mergeWith(incA) should have length 60
      mergeWith(incB) should have length 70
    }
  }

  test("concurrent loadOrBuild of the same (name, source): first publish " +
      "wins, both callers read complete identical content") {
    withFreshRoot {
      import spark.implicits._
      val src = (1L to 50L).map(i => (i, s"row $i")).toDF("doc_id", "text")
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      def serve(): Array[org.apache.spark.sql.Row] =
        IndexStore.loadOrBuild(spark, "crace", src) {
          src.select(col("doc_id"), expr("length(text)").as("n"))
        }.orderBy("doc_id").collect()
      val (r1, r2) = Await.result(
        Future(serve()).zip(Future(serve())), 120.seconds)
      r1 shouldBe r2
      r1 should have length 50
    }
  }

  test("PQ codes merge: a daily embedding increment encoded against the " +
      "standing codebooks and appended equals a full re-encode") {
    import org.apache.spark.sql.DataFrame
    withFreshRoot {
      val sfDir = sf
      val emb = Tables.load(spark, sfDir, "embeddings")
      // frozen codebooks = the trained global index (NOT merged — trained
      // indexes rebuild on change; only per-row maps merge)
      val cb = graft.ops.EmbedPq.pqCodebooks(spark, sfDir)
      val mid = emb.agg(expr("percentile_approx(vec_id, 0.5)"))
        .head().getLong(0)
      val base = emb.filter(col("vec_id") <= mid)
      val inc = emb.filter(col("vec_id") > mid) // "today's embeddings"
      def codesOf(v: DataFrame) = graft.ops.EmbedPq.encode(v, cb)
      val merged = IndexStore.mergeOrBuild(spark, "pq-codes-inc", base, inc) {
        codesOf(base)
      } { codesOf(inc) }
      val full = codesOf(emb)
      merged.count() shouldBe full.count()
      merged.orderBy("vec_id", "m").collect() shouldBe
        full.orderBy("vec_id", "m").collect()
    }
  }

  test("the registry band index assembled by increment-merge equals a " +
      "full signatures() rebuild") {
    import org.apache.spark.sql.DataFrame
    def sigRows(c: DataFrame) = graft.ops.TextDedup.signatures(c)
      .select("doc_id", "shingles", "mh", "bands")
    withFreshRoot {
      val docs = Tables.load(spark, sf, "documents")
        .select("doc_id", "text", "source")
      val inc = graft.ops.Corpus.nearDupIncrement(spark, sf)
      val merged = IndexStore.mergeOrBuild(spark, "sigs-eq", docs, inc) {
        sigRows(docs)
      } { sigRows(inc) }
      val full = sigRows(graft.ops.Corpus.withNearDups(spark, sf))
      merged.orderBy("doc_id").collect() shouldBe
        full.orderBy("doc_id").collect()
    }
  }

  test("ANN + band-index queries are hash-identical served from a " +
      "disk-loaded index in a fresh session") {
    withFreshRoot {
      val queries =
        Seq("q_knn_ivf", "q_knn_pq", "q_knn_ivfpq", "q_dedup_incremental")
      val b0 = IndexStore.builds.get
      // session 1: no index on disk — trains, publishes, serves
      val first = queries.map(q =>
        q -> SparkEntry.queries(q)(spark, sf).collect().toSeq).toMap
      (IndexStore.builds.get - b0) should be >= 4L // centroids, cb, codes, sigs
      // "fresh session": new session state + cleared memo, so the only
      // way to the index is the disk store (cross-JVM freshness is
      // exercised by the driver running Verify in a new JVM per round)
      Queries.clear()
      val fresh = spark.newSession()
      val l0 = IndexStore.loads.get
      val again = queries.map(q =>
        q -> SparkEntry.queries(q)(fresh, sf).collect().toSeq).toMap
      (IndexStore.loads.get - l0) should be >= 4L
      queries.foreach { q => again(q) shouldBe first(q) }
    }
  }

  test("merge writes O(increment) bytes: base segment files untouched, " +
      "new bytes = one increment segment + a manifest") {
    withFreshRoot {
      import spark.implicits._
      import java.nio.file.{Files, Path, Paths}
      def filesUnder(p: Path): Map[String, (Long, java.nio.file.attribute.FileTime)] = {
        if (!Files.exists(p)) return Map.empty
        val out = scala.collection.mutable.Map[String, (Long, java.nio.file.attribute.FileTime)]()
        def walk(q: Path): Unit =
          if (Files.isDirectory(q)) {
            val s = Files.list(q)
            try s.forEach(walk(_)) finally s.close()
          } else out(q.toString) = (Files.size(q), Files.getLastModifiedTime(q))
        walk(p); out.toMap
      }
      // base is 200x the increment — the v2 layout re-wrote all of it
      // per merge; v3 must not touch a byte of it
      val base = (1L to 40000L).map(i => (i, s"base doc $i payload word"))
        .toDF("doc_id", "text")
      val inc = (100000L to 100019L).map(i => (i, s"inc $i"))
        .toDF("doc_id", "text")
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"), expr("length(text)").as("n"))
      IndexStore.loadOrBuild(spark, "prop", base)(rowsOf(base)).count()
      val segRoot = Paths.get(IndexStore.root, "seg")
      val baseFiles = filesUnder(segRoot)
      val baseBytes = baseFiles.values.map(_._1).sum
      baseFiles should not be empty

      IndexStore.mergeOrBuild(spark, "prop", base, inc) { rowsOf(base) } {
        rowsOf(inc)
      }.count() shouldBe 40020L

      val afterFiles = filesUnder(segRoot)
      // every pre-merge base file survives bit-for-bit untouched
      baseFiles.foreach { case (f, meta) =>
        withClue(s"base file $f rewritten by merge: ") {
          afterFiles.get(f) shouldBe Some(meta)
        }
      }
      // exactly one new segment dir (the increment's), and the bytes the
      // merge added are proportional to the increment, not the base
      val newSegDirs = {
        val s = Files.list(segRoot)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString).toSet
        } finally s.close()
      }
      newSegDirs.size shouldBe 2
      val addedBytes = afterFiles.values.map(_._1).sum - baseBytes
      addedBytes should be > 0L
      addedBytes.toDouble should be < baseBytes.toDouble / 2
    }
  }

  test("prune retires superseded manifests and sweeps unreferenced " +
      "segments; shared base segments survive for live manifests") {
    withFreshRoot {
      import spark.implicits._
      import java.nio.file.{Files, Paths}
      val base = (1L to 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      val day1 = Seq((1001L, "d1")).toDF("doc_id", "text")
      val day2 = Seq((2001L, "d2")).toDF("doc_id", "text")
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"), expr("length(text)").as("n"))
      // day 1 and day 2 both merge against the same standing base
      IndexStore.mergeOrBuild(spark, "ret", base, day1) { rowsOf(base) } {
        rowsOf(day1) }.count() shouldBe 101L
      IndexStore.mergeOrBuild(spark, "ret", base, day2) { rowsOf(base) } {
        rowsOf(day2) }.count() shouldBe 101L
      def entries(sub: String): Set[String] = {
        val p = Paths.get(IndexStore.root, sub)
        val s = Files.list(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString).toSet
        } finally s.close()
      }
      entries("man").size shouldBe 5 // base, day1, day2, base+day1, base+day2
      entries("seg").size shouldBe 3 // base, day1, day2

      // retire everything except day2's combined index (the live one):
      // its manifest references base + day2 segments, so only the day1
      // segment is sweepable
      val live = IndexStore.signature(base.unionAll(day2))
      val (deadMan, deadSeg) = IndexStore.prune(_.endsWith(live))
      deadMan shouldBe 4
      deadSeg shouldBe 1
      entries("man").size shouldBe 1
      entries("seg").size shouldBe 2

      // the surviving index serves unchanged after the sweep
      IndexStore.mergeOrBuild(spark, "ret", base, day2) {
        fail("base rebuilt after prune"): org.apache.spark.sql.DataFrame
      } { fail("increment rebuilt after prune"): org.apache.spark.sql.DataFrame }
        .orderBy("doc_id").collect() shouldBe
        rowsOf(base.unionAll(day2)).orderBy("doc_id").collect()

      // age-based convenience: nothing is younger than an hour-old
      // cutoff... i.e. everything survives a generous window
      IndexStore.pruneOlderThan(3600L * 1000) shouldBe ((0, 0))
    }
  }

  test("a changed corpus changes the signature: the stale index is not " +
      "reused") {
    withFreshRoot {
      import spark.implicits._
      val docs = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
      var built = 0
      def serve(src: org.apache.spark.sql.DataFrame) =
        IndexStore.loadOrBuild(spark, "toy", src) {
          built += 1
          src.select(col("doc_id"), expr("length(text)").as("n"))
        }.orderBy("doc_id").collect().toSeq
      val r1 = serve(docs)
      val r2 = serve(docs) // same content: served from disk
      built shouldBe 1
      r2 shouldBe r1
      val changed = Seq((1L, "aa"), (2L, "bbb")).toDF("doc_id", "text")
      serve(changed) // new signature: forced rebuild
      built shouldBe 2
    }
  }
}
