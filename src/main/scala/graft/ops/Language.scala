package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.rules.Rules._

/** Deterministic heuristic language detector with the same interface as the
  * reference's `detect_language(text) -> (lang, confidence)`
  * (`streaming/quality_engine.py:149-161`). The reference uses `langdetect`
  * (a seeded Naive-Bayes model over ~55 languages); for a reproducible,
  * oracle-checkable engine we use stopword-profile match counts expressed as
  * pure column expressions — no UDF, fully codegen'd, and identically
  * computable in SQL.
  *
  * Decision:
  *  - `en` iff >= 1 English-stopword match — the SUPPORTED-language gate,
  *    bit-identical to the original binary detector, so the accepted set
  *    and every en confidence are unchanged;
  *  - otherwise the argmax non-English profile (es/de/fr stopwords, zh =
  *    CJK codepoint count) with deterministic preference es > de > fr > zh
  *    on ties — the refinement of the old 'unknown' bucket that gives
  *    rejected records a real detected language, like the reference;
  *  - 'unknown' only when every profile counts zero.
  *
  * confidence = min(1.0, round(0.15 * matches_of_detected_profile, 2)),
  * the reference-shaped monotone proxy (quality_engine.py:156-158 returns
  * langdetect's probability; the clean pipeline only thresholds it).
  */
object Language {

  /** Detector profile order after `en` (also the tie preference). */
  val OtherLangs: Seq[String] = Seq("es", "de", "fr", "zh")

  private val profileRe: Map[String, String] =
    TextAnalysis.StopwordProfiles.toMap

  /** Match count for one profile, 0 on empty/null text. `zh` counts CJK
    * codepoints; the rest count stopword occurrences in the lowered text.
    */
  def matchesFor(lang: String, t: Column): Column = {
    val lc = lower(t)
    val raw = lang match {
      case "en" => regexp_count(lc, lit(EnStopwords))
      case "zh" =>
        length(lc) - length(regexp_replace(lc, TextAnalysis.CjkClass, ""))
      case l => regexp_count(lc, lit(profileRe(l)))
    }
    when(TextFeatures.emptyText(t), lit(0)).otherwise(raw)
  }

  def enMatches(t: Column): Column = matchesFor("en", t)

  /** Language decision from precomputed match-count columns (en, es, de,
    * fr, zh) — see the object doc for the gate + argmax semantics.
    */
  def languageFrom(en: Column, es: Column, de: Column, fr: Column,
      zh: Column): Column =
    when(en >= 1, lit("en"))
      .when(greatest(es, de, fr, zh) === 0, lit("unknown"))
      .when(es >= de && es >= fr && es >= zh, lit("es"))
      .when(de >= fr && de >= zh, lit("de"))
      .when(fr >= zh, lit("fr"))
      .otherwise(lit("zh"))

  /** Match count of the language `languageFrom` picks. */
  def detectedMatches(en: Column, es: Column, de: Column, fr: Column,
      zh: Column): Column =
    when(en >= 1, en).otherwise(greatest(es, de, fr, zh))

  def confidenceFrom(en: Column, es: Column, de: Column, fr: Column,
      zh: Column): Column =
    least(lit(1.0),
      round(detectedMatches(en, es, de, fr, zh) * lit(ConfPerMatch), 2))

  /** Single-expression forms (recompute the counts; the clean pipeline
    * stages the counts as columns instead and uses the *From variants).
    */
  def language(t: Column): Column =
    languageFrom(matchesFor("en", t), matchesFor("es", t),
      matchesFor("de", t), matchesFor("fr", t), matchesFor("zh", t))

  def confidence(t: Column): Column =
    confidenceFrom(matchesFor("en", t), matchesFor("es", t),
      matchesFor("de", t), matchesFor("fr", t), matchesFor("zh", t))
}
