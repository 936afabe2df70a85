package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.rules.Rules._
import TextFeatures.{charClassCount, emptyText}

/** Spam detection + spam sub-score. Semantics:
  * `streaming/quality_engine.py:113-147` (_score_spam) and `:163-175`
  * (detect_spam) — both operate on the LOWERED raw text.
  */
object Spam {

  /** Number of the 5 SPAM_PATTERNS matching the lowered text. */
  def patternMatches(t: Column): Column = {
    val lt = lower(t)
    SpamPatterns.map(p => when(lt.rlike(p), lit(1)).otherwise(lit(0)))
      .reduce(_ + _)
  }

  /** detect_spam: >=2 pattern hits => spam (quality_engine.py:173). */
  def isSpam(t: Column): Column = patternMatches(t) >= SpamPatternThreshold

  /** Python repr of the matched-pattern list, e.g. "['pattern_0', 'pattern_2']"
    * — used in the spam issue's og_value (quality_engine.py:275).
    */
  def matchedPatternsRepr(t: Column): Column = {
    val lt = lower(t)
    val elems = SpamPatterns.zipWithIndex.map { case (p, i) =>
      when(lt.rlike(p), lit(s"'pattern_$i'"))
    }
    concat(lit("Matched patterns: ["),
      array_join(filter(array(elems: _*), e => e.isNotNull), ", "),
      lit("]"))
  }

  /** Q4 spam sub-score (quality_engine.py:113-147): start at 1.0, deduct
    *   0.3 * pattern_matches;
    *   0.3 if punct ratio ('!?.,;:') > 0.3;
    *   (the text.isupper() deduction is dead code — the text was lowered
    *    at :117, so isupper() is always False; preserved as a comment);
    *   0.2 if more than 2 runs of 4+ repeated chars;
    *   0.3 if digit ratio > 0.3;
    * clamp to [0, 1]. Empty text scores 0.0.
    */
  def spamScore(t: Column): Column = {
    val lt = lower(t)
    val len = length(lt)
    val punctRatio = charClassCount(lt, PunctSpamClass) / len
    val digitRatio = charClassCount(lt, DigitClass) / len
    val repeats = regexp_count(lt, lit(RepeatedRun4))
    val s = lit(1.0) - lit(0.3) * patternMatches(t) -
      when(punctRatio > lit(0.3), lit(0.3)).otherwise(lit(0.0)) -
      when(repeats > 2, lit(0.2)).otherwise(lit(0.0)) -
      when(digitRatio > lit(0.3), lit(0.3)).otherwise(lit(0.0))
    when(emptyText(t), lit(0.0))
      .otherwise(greatest(lit(0.0), least(lit(1.0), s)))
  }
}
