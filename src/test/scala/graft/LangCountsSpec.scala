package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{Language, TextAnalysis}

/** The fused LangCounts scan must equal the regex chain it replaces,
  * count for count, across every profile shape and the \b edge cases.
  */
class LangCountsSpec extends AnyFunSuite with Matchers with TestSpark {

  private val allProfiles =
    TextAnalysis.StopwordProfiles ++ TextAnalysis.ScriptProfiles

  private def regexCounts(lc: org.apache.spark.sql.Column) =
    allProfiles.map {
      case (lang, re) if re.startsWith("""\b""") =>
        regexp_count(lc, lit(re)).as(lang)
      case (lang, cls) =>
        (org.apache.spark.sql.functions.length(lc) -
          org.apache.spark.sql.functions.length(
            regexp_replace(lc, cls, ""))).as(lang)
    }

  test("fused counts ≡ regexp_count / regexp_replace chain on edge cases") {
    import spark.implicits._
    val docs = Seq(
      1L -> "the quick fox and the dog", // plain matches
      2L -> "the, (and) of. to! it?", // punctuation IS a \b boundary
      3L -> "the_ the1 athe thea _the", // \w-extended runs never match
      // Java's \b treats é as a WORD char (isLetterOrDigit) — "éthe"
      // must NOT count, unlike RE2's ASCII \b; the engine pins Spark's
      // Java semantics
      4L -> "thé café éthe the",
      // CJK chars are Java word chars too: "the世the" is ONE run (no
      // match) while the CJK codepoint still counts for the zh script
      12L -> "the世the 世 the",
      // supplementary-plane letter glues a run (no match, no crash)
      13L -> (new String(Character.toChars(0x10400)) + "the the"),
      5L -> "el la de que y por el y es la", // another Latin profile
      6L -> "世界和平 the да да", // zh + ru + en mixed
      7L -> "😀 the 😀", // surrogate pairs as neighbors
      8L -> "", // empty
      9L -> "   \t\n ", // whitespace only
      10L -> "ja on ei ja on see", // overlapping stopwords across profiles
      11L -> "テスト テスト 가개 فق") // ja + ko + ar scripts
      .toDF("doc_id", "text")
    val lc = lower(col("text"))
    val viaRegex = docs.select(col("doc_id") +: regexCounts(lc): _*)
      .orderBy("doc_id").collect()
    val counts = graft.functions.LangCounts(lc, allProfiles.map(_._2))
    val viaNative = docs.select(col("doc_id") +:
        allProfiles.zipWithIndex.map { case ((lang, _), i) =>
          counts.getItem(i).as(lang) }: _*)
      .orderBy("doc_id").collect()
    viaNative.zip(viaRegex).foreach { case (n, r) =>
      withClue(s"doc ${n.getLong(0)}: ") { n.toSeq shouldBe r.toSeq }
    }
  }

  test("fused counts ≡ regex chain on real documents (all 56 profiles)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val lc = lower(col("text"))
    val viaRegex = docs.select(col("doc_id") +: regexCounts(lc): _*)
      .orderBy("doc_id").collect()
    val counts = graft.functions.LangCounts(lc, allProfiles.map(_._2))
    val viaNative = docs.select(col("doc_id") +:
        allProfiles.zipWithIndex.map { case ((lang, _), i) =>
          counts.getItem(i).as(lang) }: _*)
      .orderBy("doc_id").collect()
    viaNative.length shouldBe viaRegex.length
    viaNative.length should be > 0
    viaNative.zip(viaRegex).foreach { case (n, r) =>
      withClue(s"doc ${n.getLong(0)}: ") { n.toSeq shouldBe r.toSeq }
    }
  }

  test("matchCounts ≡ matchesFor for the clean pipeline's 29 profiles " +
      "(incl. null-text guard parity at the call site)") {
    import spark.implicits._
    val docs = (Seq(
      (1L, "the best food in town was the service"),
      (2L, "el mejor servicio de la ciudad y por eso"),
      (3L, null.asInstanceOf[String]),
      (4L, "")) ++
      Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text").limit(150)
        .collect().map(r => (r.getLong(0) + 1000L, r.getString(1))))
      .toDF("doc_id", "text")
    val langs = "en" +: Language.OtherLangs
    val viaRegex = docs.select(col("doc_id") +:
        langs.map(l => Language.matchesFor(l, col("text")).as(l)): _*)
      .orderBy("doc_id").collect()
    val counts = Language.matchCounts(col("text"))
    val viaNative = docs.select(col("doc_id") +:
        langs.zipWithIndex.map { case (l, i) =>
          when(graft.ops.TextFeatures.emptyText(col("text")), lit(0))
            .otherwise(counts.getItem(i)).as(l) }: _*)
      .orderBy("doc_id").collect()
    viaNative.zip(viaRegex).foreach { case (n, r) =>
      withClue(s"doc ${n.getLong(0)}: ") { n.toSeq shouldBe r.toSeq }
    }
  }
}
