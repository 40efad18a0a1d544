package graft.scale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language ID, document fingerprinting. All pure Column
  * expressions (whole-stage codegen; no UDFs), each with a DuckDB-equivalent
  * formulation for the oracle.
  */
object TextStats {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text), "\\s+")))

  /** ASCII punctuation class — written explicitly (not `\p{Punct}`) so the
    * same pattern means the same thing in Java regex and RE2/DuckDB.
    */
  val punctClass: String = """[!-/:-@\[-`{-~]"""

  /** BPE-ish token estimate: word tokens + standalone punctuation runs —
    * a cheap proxy for subword tokenizers (≈ tokens for ASCII prose).
    */
  def tokenEstimate(text: Column): Column =
    tokenCount(text) + (length(text) - length(regexp_replace(text, punctClass, "")))

  /** Ratio of punctuation characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, punctClass, ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this")

  /** Fraction of tokens that are (lowercased) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    size(filter(toks, t => t.isin(stopwords: _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Mean word length. */
  def meanWordLen(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    aggregate(toks, lit(0.0), (s, t) => s + length(t)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]: length sweet-spot, low punctuation,
    * some-but-not-too-many stopwords (C4-style heuristics).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(50.0), lit(1.0))
    val punctOk = when(punctRatio(text) <= 0.2, 1.0).otherwise(0.5)
    val stopOk = when(stopwordRatio(text).between(0.01, 0.6), 1.0).otherwise(0.7)
    round(lenScore * punctOk * stopOk, 6)
  }

  /** Stopword-hit language ID heuristic: count distinctive function-word
    * tokens per language, argmax with fixed precedence (en,de,fr,es,zh).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "que", "los", "por", "una"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = split(lower(trim(text)), "\\s+")
    langMarkers.map { case (lang, ms) =>
      lang -> size(filter(toks, t => t.isin(ms: _*)))
    }
  }

  /** Predicted language ('und' when no marker hits). Ties break by the
    * fixed marker order.
    */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Document fingerprint: minimum md5 over character k-grams sampled every
    * `stride` positions — the winnowing/rolling-hash family reduced to its
    * deterministic core (identical in DuckDB for the oracle). `stride > 1`
    * is the standard winnowing density/cost lever.
    */
  def fingerprint(text: Column, k: Int = 8, stride: Int = 1): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1)), lit(stride)),
      i => md5(text.substr(i, lit(k)))))
}
