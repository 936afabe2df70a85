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
