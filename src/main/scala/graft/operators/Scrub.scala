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
}
