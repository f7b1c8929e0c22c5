package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text quality / analysis operators for training-data curation, over
 * `documents(doc_id, text, lang, source, n_chars)`. All pure Column
 * expressions (whole-stage codegen; every one reproducible in ANSI-ish
 * SQL for the DuckDB oracle).
 */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** BPE-ish subword count estimate: words + digits + punctuation runs
   *  counted separately (a cheap stand-in for a real tokenizer's piece
   *  count; deterministic and portable). */
  def tokenCountBpe(text: Column): Column =
    size(filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)) +
      size(filter(split(text, "[a-zA-Z0-9\\s]+"), t => length(t) > 0))

  /** Stopword-hit count for a tiny embedded english list. */
  private val enStops = Seq("the", "of", "and", "to", "in", "a", "is",
    "that", "it", "was", "for", "on", "are", "with", "as")

  def stopwordRatio(text: Column): Column = {
    val toks = filter(split(lower(text), "[^a-z]+"), t => length(t) > 0)
    val hits = size(filter(toks, t => t.isin(enStops.map(s => lit(s): Any): _*)))
    when(size(toks) > 0, hits.cast("double") / size(toks)).otherwise(0.0)
  }

  /**
   * Quality score in [0,1]: blend of length band, alpha ratio, punctuation
   * ratio, mean word length band, stopword ratio — the heuristic family
   * used by open web-scale curation pipelines (C4/Gopher-style rules).
   * @return (doc_id, n_tokens, alpha_ratio, punct_ratio, stop_ratio, quality)
   */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("double")
    val alpha = (nChars - length(regexp_replace(t, "[A-Za-z]", ""))) /
      greatest(nChars, lit(1.0))
    val punct = (nChars - length(regexp_replace(t, "[.,;:!?'\"()]", ""))) /
      greatest(nChars, lit(1.0))
    val nTok = tokenCountWs(t).cast("double")
    val meanWordLen = when(nTok > 0, (nChars - nTok + 1) / nTok).otherwise(0.0)
    val stop = stopwordRatio(t)
    val lengthOk = when(nTok >= 10 && nTok <= 100000, 1.0).otherwise(0.3)
    val wordLenOk = when(meanWordLen >= 3 && meanWordLen <= 12, 1.0).otherwise(0.4)
    val quality = round(
      lengthOk * 0.25 + wordLenOk * 0.15 +
        least(alpha * 1.5, lit(1.0)) * 0.3 +
        (lit(1.0) - least(punct * 5, lit(1.0))) * 0.1 +
        least(stop * 4, lit(1.0)) * 0.2, 6)
    docs.select(col(idCol), nTok.cast("long").as("n_tokens"),
      round(alpha, 6).as("alpha_ratio"), round(punct, 6).as("punct_ratio"),
      round(stop, 6).as("stop_ratio"), quality.as("quality"))
  }

  /**
   * Language identification by stopword/character heuristics: scores a
   * small set of languages by marker-token hits, picks the argmax
   * (ties → 'und'). N-gram-free but deterministic and portable.
   */
  def languageId(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "is", "that", "with"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit"),
      "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour"),
      "es" -> Seq("el", "la", "los", "que", "es", "para", "con"))
    val toks = filter(split(lower(col(textCol)), "[^a-zà-ÿ]+"), t => length(t) > 0)
    val scores = markers.map { case (lang, ms) =>
      struct(
        size(filter(toks, t => t.isin(ms.map(s => lit(s): Any): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    // argmax by hits; ties resolve to the later element in array_max's
    // struct ordering — make deterministic by (hits, lang desc→ reverse)
    val best = array_max(array(scores: _*))
    docs.select(col(idCol),
      when(best.getField("hits") > 0, best.getField("lang"))
        .otherwise(lit("und")).as("detected_lang"),
      best.getField("hits").as("marker_hits"))
  }
}
