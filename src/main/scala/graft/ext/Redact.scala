package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction / pseudonymization column operators — the compliance pass a
  * training corpus goes through before leaving its ingestion boundary:
  * partial masking (keep a verification suffix), token substitution of
  * identifier-shaped substrings, digit censuses for audit counts, and
  * deterministic pseudonymization (hash tokenization — joinable across
  * tables without exposing the raw key).
  *
  * All four are pure map-side expressions (regex + string slicing + md5):
  * they run at scan speed on 100 TB, never shuffle, and sit inside
  * whole-stage codegen. Regexes are restricted to the character-class subset
  * shared by Java regex and RE2 so an oracle engine replays them exactly.
  */
object Redact {

  /** Mask all but the last `keep` characters with '*'; values no longer than
    * `keep` pass through unmasked (there is nothing left to hide behind —
    * callers wanting full suppression use a smaller keep or [[pseudonym]]). */
  def maskTail(c: Column, keep: Int): Column =
    when(length(c) <= keep, c).otherwise(
      concat(
        repeat(lit("*"), (length(c) - keep).cast("int")),
        substring(c, -keep, keep)))

  /** Replace every digit RUN with a redaction token (identifier-shaped
    * substrings carry the re-identification risk; letters stay for
    * readability of the redacted record). */
  def redactDigitRuns(c: Column, token: String = "<ID>"): Column =
    regexp_replace(c, "[0-9]+", token)

  /** Number of digit characters — the audit metric redaction reports need
    * (how much identifying material a column carried). */
  def digitCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[0-9]", ""))).cast("long")

  /** Deterministic pseudonym: md5 of salt:value. Stable across runs and
    * tables (same input → same pseudonym, so joins still work), irreversible
    * without the salt. */
  def pseudonym(c: Column, salt: String): Column =
    md5(concat(lit(salt + ":"), c).cast("binary"))
}
