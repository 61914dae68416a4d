package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-quality / language analysis for training-data curation.
  * Pure Column expressions; ratios are exact int/int double divisions
  * (deterministic cross-engine).
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword language
    * heuristic. Real pipelines plug in fastText-style models via the
    * multimodal UDF path; the heuristic is the engine-native fallback. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una"))

  def tokenCount(words: Column): Column = size(words)

  /** Fraction of tokens found in `list`. */
  def listRatio(words: Column, list: Seq[String]): Column =
    size(filter(words, w => w.isin(list: _*))).cast("double") /
      size(words).cast("double")

  /** Heuristic quality score in [0,1]:
    * 0.4 * distinct-token ratio (repetition penalty)
    * + 0.3 * capped mean-word-length/8
    * + 0.3 * capped stopword ratio * 3 (natural-language-ness).
    * All terms are exact divisions of exact ints — deterministic. */
  def qualityScore(words: Column): Column = {
    val n = size(words).cast("double")
    val distinctRatio = size(array_distinct(words)).cast("double") / n
    val meanLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
      .cast("double") / n
    val stopRatio = listRatio(words, stopwords("en"))
    lit(0.4) * distinctRatio +
      lit(0.3) * least(meanLen / 8.0, lit(1.0)) +
      lit(0.3) * least(stopRatio * 3.0, lit(1.0))
  }

  /** Stopword-overlap language scores; predicted language = argmax with
    * a minimum evidence floor, else "und" (undetermined). */
  def langScores(words: Column): Map[String, Column] =
    stopwords.map { case (lang, list) => lang -> listRatio(words, list) }

  def predictLang(words: Column, floor: Double = 0.05): Column = {
    val scores = langScores(words).toSeq.sortBy(_._1)
    // argmax by score with deterministic lexicographic tiebreak
    val best = scores.tail.foldLeft(
      struct(scores.head._2.as("s"), lit(scores.head._1).as("l"))) {
      case (acc, (lang, score)) =>
        when(score > acc.getField("s"),
          struct(score.as("s"), lit(lang).as("l"))).otherwise(acc)
    }
    when(best.getField("s") >= floor, best.getField("l")).otherwise(lit("und"))
  }

  /** BPE-ish subword count estimate: whitespace tokens + extra splits at
    * letter/digit boundaries and every 6 chars of long words (a cheap,
    * deterministic proxy for tokenizer token counts). */
  def subwordCountEstimate(text: Column): Column = {
    val words = TextOps.tokens(text)
    aggregate(words, lit(0L), (acc, w) =>
      acc + greatest(ceil(length(w).cast("double") / 6.0).cast("long"), lit(1L)))
  }
}
