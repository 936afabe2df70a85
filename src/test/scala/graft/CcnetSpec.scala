package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{Ccnet, Ranked}

/** CCNet-style perplexity terciles: the distributed two-phase rank must
  * reproduce exact window-ntile semantics, with head = most predictable.
  */
class CcnetSpec extends AnyFunSuite with Matchers with TestSpark {

  private val dir = "/root/testdata/sf0.01"

  test("bucket assignment equals the single-window ntile formulation") {
    val docs = Tables.load(spark, dir, "documents")
    val got = Ccnet.buckets(docs)
    // naive reference: ntile over a per-source window (correct at test
    // scale, the single-task-per-source shape the operator avoids)
    val lm = graft.ops.TextAnalysis.lmScoreCols(docs,
      graft.ops.TextAnalysis.TokenSalts, Seq("source"))
    val w = Window.partitionBy("source")
      .orderBy(col("avg_condp").desc, col("doc_id"))
    val want = lm.select(col("doc_id"), col("source"), col("avg_condp"),
      (ntile(Ccnet.NBuckets).over(w) - 1).as("b0"))
      .withColumn("bucket",
        when(col("b0") === 0, "head").when(col("b0") === 1, "middle")
          .otherwise("tail"))
      .select("doc_id", "source", "avg_condp", "bucket")
    got.collect().toSet shouldBe want.collect().toSet
  }

  test("per-source bucket sizes follow the ntile split and heads score " +
      "highest") {
    val out = Ccnet.buckets(Tables.load(spark, dir, "documents")).collect()
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      val n = rows.length
      val byBucket = rows.groupBy(_.getString(3)).view.mapValues(_.length)
      withClue(s"$src: ") {
        byBucket.getOrElse("head", 0) shouldBe (n / 3 +
          (if (n % 3 >= 1) 1 else 0))
        byBucket.getOrElse("middle", 0) shouldBe (n / 3 +
          (if (n % 3 >= 2) 1 else 0))
        byBucket.getOrElse("tail", 0) shouldBe n / 3
        // score ordering: min(head) >= max(middle) >= ... up to ties
        def scores(b: String) = rows.filter(_.getString(3) == b)
          .map(_.getDouble(2))
        if (scores("head").nonEmpty && scores("middle").nonEmpty)
          scores("head").min should be >= scores("middle").max - 1e-9
        if (scores("middle").nonEmpty && scores("tail").nonEmpty)
          scores("middle").min should be >= scores("tail").max - 1e-9
      }
    }
  }

  test("Ranked.perKey assigns exact 0-based per-key positions under " +
      "heavy key skew") {
    import spark.implicits._
    // one giant key + tiny keys; values deliberately colliding to
    // exercise the tiebreak
    val df = (0 until 5000).map(i => ("big", i % 7, i)) ++
      Seq(("a", 1, 9001), ("a", 0, 9002), ("b", 5, 9003))
    val ranked = Ranked.perKey(df.toDF("k", "v", "id"), "k",
      Seq(col("v").desc, col("id").asc))
    val got = ranked.select("k", "v", "id", "_rank0", "_nkey").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    val want = (df.groupBy(_._1).flatMap { case (k, rows) =>
      rows.sortBy(t => (-t._2, t._3)).zipWithIndex.map { case (t, i) =>
        (k, t._2, t._3, i.toLong, rows.size.toLong)
      }
    }).toSet
    got.toSet shouldBe want
    got.length shouldBe df.size
  }
}
