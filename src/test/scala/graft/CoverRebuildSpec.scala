package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Unit equivalence for the r8 substring-dedup natives: CoverPositions
  * must equal the explode-every-window-then-distinct set, and the
  * Rebuild walks must equal the declarative explode + anti-join +
  * collect_list reassembly they replaced — on hand edges AND real data.
  */
class CoverRebuildSpec extends AnyFunSuite with Matchers with TestSpark {

  test("CoverPositions ≡ distinct union of exploded K-windows " +
      "(hand edges + deterministic pseudo-random start sets)") {
    import spark.implicits._
    val k = 5
    val rnd = new scala.util.Random(42)
    val hand: Seq[Seq[Int]] = Seq(
      Seq(), Seq(0), Seq(3, 3), Seq(0, 1, 2), // overlap chains
      Seq(0, 10), Seq(0, 4), Seq(0, 5), // touching vs gapped
      Seq(7, 2, 2, 0)) // unsorted with dups (collect_list order varies)
    val random = (1 to 50).map(_ =>
      Seq.fill(rnd.nextInt(30))(rnd.nextInt(60)))
    val docs = (hand ++ random).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "starts")
    val viaExpr = docs.select(col("doc_id"),
        graft.functions.CoverPositions(col("starts"), k).as("cov"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val viaExplode = docs
      .select(col("doc_id"), explode(col("starts")).as("p"))
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (k - 1))).as("pos"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    viaExpr.foreach { case (id, cov) =>
      withClue(s"doc $id: ") {
        cov.toSeq shouldBe viaExplode.getOrElse(id, Seq.empty[Int])
        cov.toSeq shouldBe cov.sorted.distinct.toSeq // ascending, unique
      }
    }
  }

  test("RebuildWords / RebuildSyms ≡ the declarative explode + anti-join " +
      "+ collect_list reassembly on real documents") {
    val k = graft.ops.TextDedup.SubstrBpeGram
    val docs = graft.ops.Corpus.withBoilerplate(spark,
      "/root/testdata/sf0.001").limit(300)
    // compare the full query outputs: the native walk vs the pre-r8
    // declarative reassembly over the same covered sets
    val viaNative = graft.ops.TextDedup.substringDedupBpe(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    import graft.ops.TextHash.words
    val withWords = docs
      .withColumn("_words", words(col("text")))
    val base = withWords
      .withColumn("_syms", graft.functions.BpeSymbols(col("_words")))
      .withColumn("n_tokens",
        org.apache.spark.sql.functions.size(col("_syms")).cast("long"))
    val symsOf = transform(col("_syms"), s => s("sym"))
    val grams = base
      .filter(col("n_tokens") >= k)
      .select(col("doc_id"),
        posexplode(graft.functions.WindowHash(symsOf, k))
          .as(Seq("p", "gh")))
      .withColumn("_ord",
        col("doc_id") * graft.ops.TextDedup.ChunkPosBase + col("p"))
    val dupKeeper = grams.groupBy(col("gh"))
      .agg(min(col("_ord")).as("_keeper"), count(lit(1)).as("_n"))
      .filter(col("_n") > 1)
      .select(col("gh"), col("_keeper"))
    val covered = grams
      .join(dupKeeper, "gh")
      .filter(col("_ord") =!= col("_keeper"))
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (k - 1))).as("pos"))
      .distinct()
    val affected = covered.select(col("doc_id")).distinct()
    val toks = base
      .join(affected, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), posexplode(col("_syms")).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos"),
        col("s")("wi").as("wi"), col("s")("sym").as("sym"))
    val keptWords = toks
      .join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"), col("wi"))
      .agg(concat_ws("", transform(
          array_sort(collect_list(struct(col("pos"), col("sym")))),
          s => s("sym"))).as("word"),
        min(col("pos")).as("wpos"), count(lit(1)).as("nk"))
    val survivors = keptWords.groupBy("doc_id")
      .agg(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("wpos"), col("word")))),
          s => s("word"))).as("_clean"),
        sum(col("nk")).as("_nk"))
    val rebuilt = affected.join(survivors, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_clean"), lit("")).as("_clean"),
        coalesce(col("_nk"), lit(0L)).as("_nk"))
    val viaDeclarative = withWords
      .select(col("doc_id"),
        graft.functions.BpeTokenCount(col("text")).as("n_tokens"),
        col("_words"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_clean"), concat_ws(" ", col("_words")))
          .as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("_nk"), col("n_tokens")))
          .as("n_removed"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    viaNative.keySet shouldBe viaDeclarative.keySet
    // the corpus must exercise real coverage for the comparison to bite
    viaNative.values.count(_._3 > 0) should be > 0
    viaNative.foreach { case (id, v) =>
      withClue(s"doc $id: ") { v shouldBe viaDeclarative(id) }
    }
  }
}
