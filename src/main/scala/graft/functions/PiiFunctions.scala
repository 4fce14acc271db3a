package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for web-corpus curation (the standard
  * pre-release pass next to dedup and quality filtering: emails,
  * phone numbers, and IP addresses are masked with typed placeholder
  * tokens before a corpus ships). Beyond-reference surface, same
  * family as [[WebFunctions]].
  *
  * Patterns are deliberately RE2-safe (no lookarounds, no
  * backreferences) and chosen to evaluate identically under Java
  * regex and DuckDB's RE2 — the x48 oracle replays detection counts
  * and the full redaction chain term for term:
  *
  *  - email: `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`
  *  - IPv4:  `\b` 1-3 digits ×4 dotted `\b` (word-bounded so it
  *    can't eat digit runs inside longer numbers)
  *  - phone: optional `+`, then word-bounded 3-3-4 digit groups
  *    separated by `-` or space (the fixture's normalized
  *    North-American shape; a real deployment swaps in locale
  *    patterns — the dial is the pattern list, nothing else). The
  *    `\b` guards keep the pattern from matching INSIDE longer
  *    digit runs ("ref 2555-010-12345" contains no phone) — RE2 has
  *    no lookarounds, so ASCII word boundaries are the
  *    engine-portable anchor, with the documented consequence that
  *    a digit run glued to a letter ("x555-010-1234") also doesn't
  *    match
  *
  * REDACTION ORDER IS PART OF THE CONTRACT: email → phone → IPv4.
  * Email first because its local/domain parts can contain digit runs
  * and dots a later pattern could clip; IPv4 last so a phone's digit
  * groups are already masked and can't alias a dotted quad. Both
  * engines apply the same chain, so the order is gated, not assumed.
  *
  * Scale shape: pure per-row regexp projection — zero exchange at
  * any corpus size, native codegen'd `regexp_replace`/`regexp_count`
  * (no UDF).
  */
object PiiFunctions {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+?\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b"

  /** Per-text PII hit counts (detection report, no mutation). */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** The redaction chain (email → phone → IPv4, see order contract
    * above): each match replaced by its typed placeholder. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")
}
