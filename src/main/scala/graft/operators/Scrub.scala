package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: regex redaction of emails, phone
  * numbers, SSN-shaped ids and IPv4 addresses, plus per-document match
  * counts (for curation stats / filtering on PII density).
  *
  * Pure `functions._` composition (`regexp_count` / `regexp_replace`),
  * so the whole scrub runs inside whole-stage codegen in one map pass —
  * no shuffle, no UDF. Patterns are restricted to the regex subset with
  * identical semantics in Java (Spark) and RE2 (DuckDB/Go scanners): no
  * backreferences, no lookaround — so the same rule set is portable
  * across enforcement points.
  */
object Scrub {

  /** One redaction rule: pattern → replacement tag. */
  final case class Rule(name: String, pattern: String, replacement: String)

  val email: Rule = Rule("email",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")

  /** SSN-shaped: 3-2-4 digit groups with dashes. Ordered BEFORE phone so
    * the phone rule's 3-3-4 shape cannot partially consume one. */
  val ssn: Rule = Rule("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>")

  /** North-American-style 3-3-4 phone with `-`, `.` or space separators
    * and an optional `+d`/`+dd` country prefix. */
  val phone: Rule = Rule("phone",
    "(\\+\\d{1,2}[ ])?\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>")

  val ipv4: Rule = Rule("ipv4",
    "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>")

  /** Default rule chain; order matters (ssn before phone). */
  val defaultRules: Seq[Rule] = Seq(email, ssn, phone, ipv4)

  /** Total match count across rules on the UNREDACTED text. */
  def piiCount(c: Column, rules: Seq[Rule] = defaultRules): Column =
    rules.map(r => regexp_count(c, lit(r.pattern))).reduce(_ + _)

  /** Apply the rule chain in order. */
  def redact(c: Column, rules: Seq[Rule] = defaultRules): Column =
    rules.foldLeft(c)((acc, r) => regexp_replace(acc, r.pattern, r.replacement))

  /** Table form: replaces `textCol` with its redacted version and appends
    * `n_pii` (match count before redaction). */
  def redactTable(df: DataFrame, textCol: String,
      rules: Seq[Rule] = defaultRules): DataFrame =
    df.withColumn("n_pii", piiCount(col(textCol), rules))
      .withColumn(textCol, redact(col(textCol), rules))

  // ------------------------------------------------------------------
  // Encoding / tokenization hygiene (the ftfy-and-special-token guard)

  /** Common UTF-8-read-as-Latin-1 mojibake sequences (`Ã©` for `é`,
    * `â€™` for `'`, `ï¿½` for a misread replacement char) plus the
    * replacement character itself — the signature of a double-decoded
    * or corrupted crawl. The oracle SQL interpolates THIS constant, so
    * the scanned byte sequence is identical in both engines by
    * construction. */
  val mojibake: String = "Ã[©¨¤¶¼]|â€[™œ¦]|ï¿½|�"

  /** C0 control characters except tab/newline/CR — never legitimate in
    * crawled text; their presence means binary contamination or a
    * charset bug upstream. */
  val controlChars: String = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"

  /** Reserved tokenizer special tokens leaked INTO the raw text
    * (`<|endoftext|>`, `[SEP]`, `<s>`…): a document carrying one would
    * inject control structure into training sequences. */
  val specialTokens: String =
    "<\\|[A-Za-z_]+\\|>|\\[(CLS|SEP|PAD|MASK|UNK)\\]|</?s>|<(pad|unk|mask)>"

  /** Encoding/tokenization hygiene scan: per-document counts of mojibake
    * sequences, stray control characters, and leaked tokenizer special
    * tokens, plus an `is_clean` verdict — the drop/repair signal of the
    * encoding-fix stage (ftfy et al.) without the repair dependency.
    *
    * Pure `regexp_count` composition — one codegen'd map pass, no
    * shuffle, no UDF; `is_clean` folds to a pushable predicate (filter
    * on it and Catalyst prunes at the scan). Patterns are Java/RE2
    * portable like the PII rules above. */
  def encodingArtifacts(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol),
      regexp_count(col(textCol), lit(mojibake)).as("n_mojibake"),
      regexp_count(col(textCol), lit(controlChars)).as("n_ctrl"),
      regexp_count(col(textCol), lit(specialTokens)).as("n_special"))
      .withColumn("is_clean",
        col("n_mojibake") + col("n_ctrl") + col("n_special") === 0)

  /** [[encodingArtifacts]]'s `is_clean` verdict as a bare predicate
    * COLUMN — the composition-friendly form for pipelines that must
    * keep their other columns (a streaming ingest filter can't afford
    * the projection): same three regexp_count terms, same codegen'd
    * zero-shuffle shape, pushable by Catalyst. */
  def encodingClean(c: Column): Column =
    regexp_count(c, lit(mojibake)) +
      regexp_count(c, lit(controlChars)) +
      regexp_count(c, lit(specialTokens)) === 0
}
