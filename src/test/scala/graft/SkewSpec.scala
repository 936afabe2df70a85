package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Salted

/** Salted join must produce exactly the plain join's rows, including on a
  * pathologically skewed key distribution.
  */
class SkewSpec extends AnyFunSuite with Matchers with TestSpark {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of rows share one hot key
    val left = spark.range(0, 20000)
      .select(col("id"),
        when(col("id") % 10 < 9, lit(42L)).otherwise(col("id") % 100)
          .as("k"))
    val right = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "attr")

    val plain = left.join(right, Seq("k"))
      .select("id", "k", "attr").orderBy("id").collect()
    val salted = Salted.join(left, right, key = "k",
        saltSource = "id", salts = 8)
      .select("id", "k", "attr").orderBy("id").collect()
    salted.length shouldBe plain.length
    salted.zip(plain).foreach { case (a, b) => a shouldBe b }
  }

  test("salted IVF probe join bounds the hot centroid's key-group " +
      "and leaves knnIvf results unchanged") {
    import spark.implicits._
    // skewed inverted lists: 80% of vectors assigned to one hot centroid —
    // the shuffle-task input for a key group is proportional to its size,
    // so bounding the (key, salt) group size IS bounding the task input
    val salts = 8
    val assigned = spark.range(0, 10000)
      .select(col("id").as("vec_id"),
        when(col("id") % 10 < 8, lit(1L)).otherwise(col("id") % 5)
          .as("centroid_id"))
    val hot = assigned.groupBy("centroid_id").count()
      .agg(max("count")).head.getLong(0)
    val saltedMax = assigned
      .withColumn("_salt", pmod(hash(col("vec_id")), lit(salts)))
      .groupBy("centroid_id", "_salt").count()
      .agg(max("count")).head.getLong(0)
    hot shouldBe 8000L
    // each (centroid, salt) group carries ~hot/salts rows; 1.5x headroom
    // for hash imbalance
    saltedMax should be <= (hot / salts * 3 / 2)

    // and the production query is invariant under salting (bit-identical
    // top-k): salts=1 is the plain join path
    val dir = "/root/testdata/sf0.001"
    val plain = graft.ops.EmbedSim.knnIvf(spark, dir, salts = 1).collect()
    val salted = graft.ops.EmbedSim.knnIvf(spark, dir).collect()
    salted.length shouldBe plain.length
    salted.zip(plain).foreach { case (a, b) => a shouldBe b }
  }

  test("TopK custom operator equals window on skewed random data") {
    import spark.implicits._
    // heavy ties + a hot key: the worst case for heap/tiebreak bugs
    val rnd = new scala.util.Random(7)
    val rows = (0 until 5000).map { i =>
      val key = if (rnd.nextInt(10) < 6) 1L else rnd.nextInt(50).toLong
      (i.toLong, key, rnd.nextInt(20).toDouble) // many value ties
    }
    val df = rows.toDF("id", "k", "v")
      .repartition(8) // force multi-partition partial phase
    df.cache().count()
    val custom = graft.plans.TopK.perKey(df, Seq("k"),
        Seq(graft.plans.TopK.desc("v"), graft.plans.TopK.asc("id")), k = 7)
      .select("k", "id", "v").orderBy("k", "id").collect()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      .orderBy(desc("v"), col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7).select("k", "id", "v")
      .orderBy("k", "id").collect()
    custom.length shouldBe viaWindow.length
    custom.zip(viaWindow).foreach { case (a, b) => a shouldBe b }
    df.unpersist()
  }

  test("salted token joins leave rareTokens/lmScore values unchanged " +
      "and bound the hot token's per-key group") {
    import graft.ops.TextAnalysis
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    // salts = 1 is the plain unsalted join path (constant salt column)
    Seq[(String, Int => org.apache.spark.sql.DataFrame)](
      "rareTokens" -> (s => TextAnalysis.rareTokens(docs, salts = s)),
      "lmScore" -> (s => TextAnalysis.lmScore(docs, salts = s))
    ).foreach { case (name, run) =>
      withClue(s"$name: ") {
        val plain = run(1).collect()
        val salted = run(TextAnalysis.TokenSalts).collect()
        salted.length shouldBe plain.length
        salted.zip(plain).foreach { case (a, b) => a shouldBe b }
      }
    }
    // the Zipf head: the hottest token's (tok, salt) groups each carry a
    // bounded share of its occurrences — the shuffle-task input bound.
    // The salt is the PRODUCTION one (Salted.join with saltSource =
    // doc_id: pmod(hash(doc_id), S)), under which every occurrence of a
    // token within one document shares a salt — so the per-group bound is
    // over DOCUMENT mass per (token, salt), looser than a per-occurrence
    // salt but exactly what the shipped join spreads.
    import spark.implicits._
    val toks = docs.select(col("doc_id"), explode(
      graft.ops.TextHash.words(col("text"))).as("tok"))
      .withColumn("_salt", pmod(hash(col("doc_id")),
        lit(TextAnalysis.TokenSalts)))
    val hot = toks.groupBy("tok").count().agg(max("count")).head.getLong(0)
    val saltedMax = toks.groupBy("tok", "_salt").count()
      .agg(max("count")).head.getLong(0)
    // every hot-token group must genuinely split (no salt owns the key),
    // with 2x headroom over the ideal hot/S share for doc-granularity
    // imbalance (docs are small relative to the hot token's total here)
    saltedMax should be < hot
    saltedMax should be <= (hot / TextAnalysis.TokenSalts * 2)
  }
}
