package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (beyond the reference — BASELINE.json north star): language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All are pure `Column` compositions over `org.apache.spark.sql.functions`
  * — fully codegen'd, no UDFs in the hot path, safe inside one
  * WholeStageCodegen span over a 100 TB scan.
  */
object TextAnalysis {

  /** Whitespace word tokens. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(words(text)))

  /** BPE-ish subword-budget estimate: word-chars/4 + non-space punct,
    * the usual cheap proxy when no tokenizer is available. */
  def tokenEstimate(text: Column): Column =
    ceil(length(regexp_replace(text, "\\s+", "")).cast("double") / 4.0).cast("long")

  /** Count occurrences of one exact word among whitespace tokens. */
  def wordOccurrences(text: Column, word: String): Column =
    size(filter(words(text), w => w === lit(word)))

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: the heuristic is argmax over marker hits. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "les", "des", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Per-language marker-hit score. */
  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(m => wordOccurrences(text, m)).reduce(_ + _)

  /** Predicted language: argmax of marker scores, first-listed wins ties,
    * "und" (undetermined) when no marker hits at all. */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, ms) => lang -> langScore(text, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
    // foldRight keeps the FIRST max (earlier whens win in the final chain)
    pick
  }

  /** Quality-score components (length, punctuation ratio, stopword ratio,
    * mean word length) and a composite in [0,1] — heuristics in the
    * Gopher/C4 filtering tradition. */
  def nChars(text: Column): Column = length(text)
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.!?,;:]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")
  def stopwordRatio(text: Column, markers: Seq[String] = Seq("the", "a", "of", "and", "to")): Column =
    markers.map(m => wordOccurrences(text, m)).reduce(_ + _).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")
  def meanWordLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  def qualityScore(text: Column): Column = {
    val lenOk = when(nChars(text).between(50, 5000), 1.0).otherwise(0.0)
    val swr = stopwordRatio(text)
    val swOk = when(swr > 0.01 && swr < 0.5, 1.0).otherwise(0.0)
    val mwl = meanWordLen(text)
    val mwlOk = when(mwl >= 2.0 && mwl <= 12.0, 1.0).otherwise(0.0)
    (lenOk + swOk + mwlOk) / 3.0
  }

  /** Intra-document duplicate n-gram fraction — the Gopher/RefinedWeb
    * repetition signal (Rae et al. 2021 §A1.1; Penedo et al. 2023):
    * (total n-grams − distinct n-grams) / total, 0 for empty docs.
    * Distinctness via the codegen'd shingle-hash set (64-bit XXH64 —
    * collision-free in practice at document size). */
  def dupNgramFraction(text: Column, n: Int): Column = {
    import graft.functions.TextHashExpressions.shingle_hash_set
    val ws = words(text)
    val total = greatest(size(ws) - (n - 1), lit(0))
    when(total > 0,
      (total - size(shingle_hash_set(ws, n))).cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Deterministic document fingerprint: md5 over whitespace-normalized
    * lowercase text (the reference has no engine-side hashing; this is the
    * standard exact-dedup key at pipeline scale). */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")).cast("binary"))

  /** Word n-gram shingles (for MinHash / Jaccard dedup). Guarded: Spark's
    * `sequence(0, -1)` would count DOWN, so short texts get an empty array
    * explicitly. */
  def shingles(text: Column, n: Int): Column = {
    val ws = words(text)
    when(size(ws) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
  }
}
