package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for text columns: ordered regex rewrite rules plus
  * per-pattern hit counts — the scrub stage of a training-data
  * pipeline (emails/phones/ids must not reach the training corpus).
  *
  * Everything here is narrow (scan-local `regexp_replace`, no shuffle,
  * stays inside whole-stage codegen), so the operator costs one pass
  * over the text bytes regardless of corpus size. Patterns are written
  * in the common subset of Java regex and RE2 (character classes +
  * counted quantifiers, no backrefs/lookahead), so an external SQL
  * engine reproduces the rewrite byte-for-byte — which is also what
  * makes the battery oracle (q66) checkable.
  *
  * Rule order matters and is applied first-to-last: the more specific
  * pattern (phone) must run before the digit-run catch-all that would
  * otherwise consume its digits.
  */
object Redact {

  /** NANP-style phone: 3-3-4 digit groups, dash-separated. */
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Email addresses (pragmatic form, not RFC 5322). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Bare digit runs (account numbers, ids) of length >= 3. */
  val DigitRunPattern = "[0-9]{3,}"

  /** Default rule set, most-specific first. */
  val DefaultRules: Seq[(String, String)] = Seq(
    EmailPattern -> "[EMAIL]",
    PhonePattern -> "[PHONE]",
    DigitRunPattern -> "[NUM]")

  /** Apply rewrite rules in order (each `regexp_replace` is global,
    * matching Spark semantics; SQL oracles need the 'g' flag). */
  def redact(text: Column, rules: Seq[(String, String)] = DefaultRules): Column =
    rules.foldLeft(text) { case (acc, (re, tag)) => regexp_replace(acc, re, tag) }

  /** Number of matches of `pattern` in `text` (codegen'd built-in). */
  def hits(text: Column, pattern: String): Column = regexp_count(text, lit(pattern))
}
