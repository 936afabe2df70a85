package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.rules.Rules._

/** Deterministic heuristic language detector with the same interface as the
  * reference's `detect_language(text) -> (lang, confidence)`
  * (`streaming/quality_engine.py:149-161`). The reference uses `langdetect`
  * (a seeded Naive-Bayes model); for a reproducible, oracle-checkable engine
  * we use an English-stopword density heuristic expressed as pure column
  * expressions — no UDF, fully codegen'd, and identically computable in SQL.
  *
  * confidence = min(1.0, round(0.15 * matches, 2)); language = "en" iff at
  * least one stopword occurrence, else "unknown" (which the clean pipeline
  * rejects as unsupported_language, mirroring quality_engine.py:245-255).
  */
object Language {

  def enMatches(t: Column): Column =
    when(TextFeatures.emptyText(t), lit(0))
      .otherwise(regexp_count(lower(t), lit(EnStopwords)))

  def language(t: Column): Column =
    when(enMatches(t) >= 1, lit("en")).otherwise(lit("unknown"))

  def confidence(t: Column): Column =
    least(lit(1.0), round(enMatches(t) * lit(ConfPerMatch), 2))
}
