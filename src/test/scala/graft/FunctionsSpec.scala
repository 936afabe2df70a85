package graft

import org.apache.spark.sql.functions.{col, lit, lower}
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.{CharClassParser, TextStats}
import graft.rules.Rules._

/** The fused TextStats expression must agree exactly with the regex-based
  * column formulas it replaced, and the CountInClass optimizer rule must
  * rewrite the char-class-count idiom without changing results.
  */
class FunctionsSpec extends AnyFunSuite with Matchers with TestSpark {

  private val tricky = Seq(
    "hello world",
    "this is great!!! really... yes?!",
    "...leading and trailing,,,",
    "ALLCAPS TEXT 123",
    "aaaa bbbbb c dd",
    "a..b.. ..c.. ....",
    "tabs\tand\nnewlines  double  spaces",
    "%%%% @@@@ aaaa", // runs outside vs inside the restricted set
    "1234567890 0.5% (50)",
    "  ", "x", "",
    "unicode éééé café")

  test("TextStats fields match the regex-based formulas") {
    import spark.implicits._
    val df = tricky.toDF("t").withColumn("s", TextStats(lower(col("t"))))
    val checks = df.select(
      col("t"),
      col("s").getField("char_count") === F.length(lower(col("t"))),
      col("s").getField("word_count") ===
        F.size(F.filter(F.split(lower(col("t")), """\s+"""), w => w =!= "")),
      col("s").getField("sentence_marks") ===
        (F.length(col("t")) - F.length(F.regexp_replace(lower(col("t")), SentenceClass, ""))),
      col("s").getField("digit") ===
        (F.length(col("t")) - F.length(F.regexp_replace(lower(col("t")), DigitClass, ""))),
      col("s").getField("punct_spam") ===
        (F.length(col("t")) - F.length(F.regexp_replace(lower(col("t")), PunctSpamClass, ""))),
      col("s").getField("runs4") === F.regexp_count(lower(col("t")), lit(RepeatedRun4)),
      col("s").getField("strip_sum") ===
        F.aggregate(F.filter(F.split(lower(col("t")), """\s+"""), w => w =!= ""),
          lit(0), (acc, w) => acc + F.length(F.regexp_replace(w, WordStripClass, ""))))
    checks.collect().foreach { r =>
      withClue(s"input='${r.getString(0)}': ") {
        (1 until r.length).foreach { i =>
          withClue(s"field $i: ") { r.getBoolean(i) shouldBe true }
        }
      }
    }
  }

  test("alpha counts ASCII letters only (matches [A-Za-z] semantics)") {
    import spark.implicits._
    val r = Seq("café 123 ABC").toDF("t")
      .select(TextStats(col("t")).getField("alpha")).head()
    r.getInt(0) shouldBe 6 // c,a,f,A,B,C — é excluded like [A-Za-z]
  }

  test("CharClassParser expands simple classes and bails on fancy ones") {
    CharClassParser.expand("[.!?]") shouldBe Some(".!?")
    CharClassParser.expand("[0-9]") shouldBe Some("0123456789")
    CharClassParser.expand("[A-Za-z]").get should have length 52
    CharClassParser.expand("""[.,!?;:'"()\-]""") shouldBe Some(""".,!?;:'"()-""")
    CharClassParser.expand("[^a]") shouldBe None
    CharClassParser.expand("""[\d]""") shouldBe None
    CharClassParser.expand("""[\x{4e00}-\x{9fff}]""") shouldBe None
  }

  test("native MinHashSig equals the column-expression minhashes") {
    import graft.ops.{TextDedup, TextHash}
    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val viaExpr = corpus
      .withColumn("w", TextHash.words(col("text")))
      .filter(F.size(col("w")) >= TextDedup.ShingleK)
      .withColumn("sh", TextHash.shingles(col("w"), TextDedup.ShingleK))
      .select(col("doc_id"),
        TextHash.minhashes(col("sh"), TextDedup.MinhashK).as("mh"))
    val viaNative = corpus
      .withColumn("w", TextHash.words(col("text")))
      .filter(F.size(col("w")) >= TextDedup.ShingleK)
      .select(col("doc_id"),
        graft.functions.MinHashSig(lower(col("text"))).as("mh"))
    val a = viaExpr.orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val b = viaNative.orderBy("doc_id").collect().map(_.getSeq[Long](1))
    a.length should be > 100
    a.zip(b).foreach { case (x, y) => x shouldBe y }
  }

  test("native ShingleHashes equals the declarative shingle+md5 chain " +
      "(multiset for k=1,2; distinct set for k=5) and handles edges") {
    import graft.ops.TextHash
    val corpus = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), col("text"))
    def viaExpr(k: Int) = corpus
      .withColumn("w", TextHash.words(col("text")))
      .select(col("doc_id"),
        F.transform(
          F.when(F.size(col("w")) >= k, TextHash.shingles(col("w"), k))
            .otherwise(F.array()),
          g => TextHash.h56(g)).as("hs"))
    // k = 1 and 2 WITH multiplicity: the dsir gram stream. shingles()
    // is distinct, so build the multiset form by hand for the check
    def viaExprMulti(k: Int) = corpus
      .withColumn("w", TextHash.words(col("text")))
      .select(col("doc_id"),
        F.transform(
          F.when(F.size(col("w")) >= k,
            F.transform(F.sequence(F.lit(0), F.size(col("w")) - k),
              i => F.concat_ws(" ",
                (0 until k).map(j => F.element_at(col("w"), i + j + 1)): _*)))
            .otherwise(F.array()),
          g => TextHash.h56(g)).as("hs"))
    for (k <- Seq(1, 2)) {
      val a = viaExprMulti(k).orderBy("doc_id").collect()
        .map(_.getSeq[Long](1).sorted)
      val b = corpus.select(col("doc_id"),
          graft.functions.ShingleHashes(lower(col("text")), k).as("hs"))
        .orderBy("doc_id").collect().map(_.getSeq[Long](1).sorted)
      a.length shouldBe 500
      a.zip(b).foreach { case (x, y) => x shouldBe y }
    }
    // k = 5 distinct: the ngram-novelty stream (shingles() IS distinct)
    val a5 = viaExpr(5).orderBy("doc_id").collect()
      .map(_.getSeq[Long](1).toSet)
    val b5 = corpus.select(col("doc_id"),
        graft.functions.ShingleHashes(lower(col("text")), 5,
          distinct = true).as("hs"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1).toSet)
    a5.zip(b5).foreach { case (x, y) => x shouldBe y }
    // edges: empty text, whitespace-only, single word, fewer words than k
    import spark.implicits._
    val edges = Seq((1L, ""), (2L, "  \t\n "), (3L, "Word"),
      (4L, "two words")).toDF("doc_id", "text")
    val got = edges.select(col("doc_id"),
        graft.functions.ShingleHashes(lower(col("text")), 2).as("hs"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    got(0) shouldBe empty
    got(1) shouldBe empty
    got(2) shouldBe empty // one word, no bigram
    got(3) should have size 1
  }

  test("native SimHashSig equals the column-expression bit sums") {
    import graft.ops.{TextDedup, TextHash}
    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("w", TextHash.words(col("text")))
      .filter(F.size(col("w")) >= 1)
    val viaExpr = corpus
      .select(col("doc_id"), TextDedup.simhashLongRef(col("text")).as("sh"))
      .orderBy("doc_id").collect().map(_.getLong(1))
    val viaNative = corpus
      .select(col("doc_id"),
        graft.functions.SimHashSig(lower(col("text"))).as("sh"))
      .orderBy("doc_id").collect().map(_.getLong(1))
    viaExpr.length should be > 100
    viaExpr.zip(viaNative).foreach { case (x, y) => x shouldBe y }
  }

  test("CountInClassRule rewrites the idiom and preserves results") {
    // parquet-backed source: local relations constant-fold before the plan
    // can be inspected
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val idiom = docs.select(col("doc_id"),
      (F.length(col("text")) - F.length(F.regexp_replace(col("text"), "[0-9]", "")))
        .as("digits"))
    idiom.queryExecution.optimizedPlan.toString should include("count_in_class")
    val viaRule = idiom.orderBy("doc_id").collect().map(_.getInt(1))
    val direct = docs.select(col("doc_id"),
        F.length(col("text")).as("n"),
        F.length(F.regexp_replace(col("text"), "[0-9]", "")).as("m"))
      .orderBy("doc_id").collect().map(r => r.getInt(1) - r.getInt(2))
    viaRule.toSeq shouldBe direct.toSeq
  }

  test("native functions are SQL-callable via the extensions") {
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("docs_sql")
    val r = spark.sql(
      """SELECT text_stats(text).word_count AS wc,
        |  minhash_sig(lower(text))[0] AS mh0,
        |  count_in_class(text, '0123456789') AS digits
        |FROM docs_sql WHERE doc_id = 1""".stripMargin).head()
    r.getAs[Int]("wc") should be > 0
    r.getAs[Long]("mh0") should be >= 0L
    r.getAs[Int]("digits") should be >= 0
  }

  test("native DotProduct equals the HOF aggregate(zip_with) fold") {
    import graft.functions.DotProduct
    // the real embeddings table plus adversarial literals: empty arrays,
    // unequal lengths (min-length semantics), nulls, and non-finite values
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("a"))
      .withColumn("b", F.reverse(col("a")))
    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      F.aggregate(F.zip_with(a, b, (x, y) => x * y), lit(0.0),
        (acc, v) => acc + v)
    val rows = emb.select(DotProduct(col("a"), col("b")).as("n"),
      hof(col("a"), col("b")).as("h")).collect()
    rows.length should be > 100
    rows.foreach { r => r.getDouble(0) shouldBe r.getDouble(1) }

    import spark.implicits._
    val edge = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq.empty[Double], Seq(1.0)),
      (Seq(1.0, 2.0), Seq(3.0)), // unequal length: zip_with pads with null,
      // x * null -> null, acc + null -> null; DotProduct uses min length —
      // tested separately below, so here only equal-length rows
      (Seq(Double.MaxValue, 1e-300), Seq(2.0, 1e300))
    ).toDF("a", "b")
    val eq = edge.filter(F.size(col("a")) === F.size(col("b")))
      .select(DotProduct(col("a"), col("b")), hof(col("a"), col("b")))
      .collect()
    eq.foreach { r => r.getDouble(0) shouldBe r.getDouble(1) }
    // null inputs -> null out (BinaryExpression null-safe contract)
    val n = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
      .select(DotProduct(col("a"), col("b"))).head()
    n.isNullAt(0) shouldBe true
    // null ELEMENT -> null out, matching the HOF fold (x * null -> null,
    // acc + null -> null) instead of silently reading the slot as 0.0
    val ne = Seq(
      (Seq(Some(1.0), None, Some(3.0)), Seq(Some(4.0), Some(5.0), Some(6.0))),
      (Seq(Some(1.0), Some(2.0)), Seq(Some(4.0), Some(5.0))))
      .toDF("a", "b")
      .select(DotProduct(col("a"), col("b")).as("n"),
        hof(col("a"), col("b")).as("h"))
      .collect()
    ne(0).isNullAt(0) shouldBe true
    ne(0).isNullAt(1) shouldBe true
    ne(1).getDouble(0) shouldBe 14.0
    ne(1).getDouble(1) shouldBe 14.0
    // SQL-callable and codegen'd (no interpreted HOF in the plan)
    val viaSql = spark.sql("SELECT dot_product(array(1.0d,2.0d), array(3.0d,4.0d))")
    viaSql.head().getDouble(0) shouldBe 11.0
  }

  test("rule leaves non-matching shapes alone") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // different columns on the two sides -> no rewrite
    val plan = docs.select(
      (F.length(col("source")) - F.length(F.regexp_replace(col("text"), "[0-9]", "")))
        .as("n")).queryExecution.optimizedPlan.toString
    plan should not include "count_in_class"
  }
}
