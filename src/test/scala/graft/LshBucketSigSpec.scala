package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.EmbedLsh

/** The fused LshBucketSig expression must agree bit-for-bit with the
  * per-plane DotProduct expression-tree form it replaced — including the
  * null-element degradation (null slot in the zipped prefix => no sign bit
  * in any band) and short/long embedding prefixes.
  */
class LshBucketSigSpec extends AnyFunSuite with Matchers with TestSpark {

  private def assertSame(df: org.apache.spark.sql.DataFrame,
      w: Int, bands: Int): Unit = {
    val mismatches = df
      .select(col("emb"),
        EmbedLsh.bucketCols(col("emb"), w, bands).as("fused"),
        EmbedLsh.bucketColsRef(col("emb"), w, bands).as("ref"))
      .filter(!(col("fused") <=> col("ref")))
      .count()
    mismatches shouldBe 0L
  }

  test("matches the reference form on the real embeddings (both geometries)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("embedding").cast("array<double>").as("emb"))
    assertSame(emb, EmbedLsh.BandBits, EmbedLsh.Bands) // historical 6x6
    assertSame(emb, 10, 13) // the sf1 adaptive geometry
  }

  test("matches on nulls, null elements, short and long arrays") {
    import spark.implicits._
    val rows: Seq[Seq[java.lang.Double]] = Seq(
      Seq.empty[java.lang.Double], // empty => every dot 0.0 >= 0
      Seq[java.lang.Double](1.0, -2.0, 3.0), // shorter than Dim
      Seq[java.lang.Double](1.0, null, 3.0), // null slot => no bits anywhere
      Seq.tabulate[java.lang.Double](EmbedLsh.Dim)(d => math.sin(d + 1)),
      Seq.tabulate[java.lang.Double](EmbedLsh.Dim + 8)(d =>
        math.cos(d * 0.7)), // longer than Dim: prefix only
      Seq.tabulate[java.lang.Double](EmbedLsh.Dim)(_ => 0.0)) // ties: 0 >= 0
    val df = rows.toDF("emb").select(col("emb").cast("array<double>").as("emb"))
    assertSame(df, 6, 6)
    assertSame(df, 8, 9)
  }

  test("null ARRAY: fused is null-in-null-out (deliberate divergence)") {
    // The reference form degrades a null embedding to the no-bits array
    // [b * 2^w, ...] (DotProduct nulls under `when` fall to 0 per plane);
    // the fused UnaryExpression propagates null instead — the saner
    // contract (a missing vector has no buckets, rather than colliding
    // every null vector into the same bands). No corpus carries null
    // embeddings, so candidate generation is unaffected either way.
    import spark.implicits._
    val df = Seq[Option[Seq[Double]]](None, Some(Seq(1.0, 2.0)))
      .toDF("emb").select(col("emb").cast("array<double>").as("emb"))
    val out = df.select(col("emb").isNull.as("isnull"),
      EmbedLsh.bucketCols(col("emb"), 6, 6).as("b")).collect()
    out.foreach { r =>
      if (r.getBoolean(0)) r.isNullAt(1) shouldBe true
      else r.isNullAt(1) shouldBe false
    }
  }
}
