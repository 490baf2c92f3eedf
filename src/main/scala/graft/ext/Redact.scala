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

  /** k-anonymity audit (Sweeney, IJUFKS '02) — the release-risk check that
    * complements redaction: a row is k-anonymous when at least k−1 OTHER
    * rows share its quasi-identifier tuple, so the re-identification
    * surface is the distribution of QI equivalence-CLASS sizes. Returns
    * that distribution — one row per class size: how many classes, how
    * many records they hold, and whether the size violates the caller's k
    * (class_size < k ⇒ those records are linkable below the k-anonymity
    * floor and need generalization or suppression before release).
    *
    * Scale shape: one QI-keyed aggregation over the corpus (map-side
    * combined) and one bounded aggregation over class sizes; the output is
    * O(distinct class sizes) — an audit artifact, not a rewrite. */
  def kAnonymityAudit(df: org.apache.spark.sql.DataFrame,
                      qiCols: Seq[Column], k: Int): org.apache.spark.sql.DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be at least 2, got $k")
    df.groupBy(qiCols: _*).agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"))
      .withColumn("n_rows", col("class_size") * col("n_classes"))
      .withColumn("below_k", (col("class_size") < k).cast("int"))
  }

  /** l-diversity audit (Machanavajjhala et al., TKDD '07) — the
    * homogeneity-attack complement to [[kAnonymityAudit]]: a QI class can
    * be comfortably k-anonymous and still LEAK the sensitive attribute if
    * all its rows share one sensitive value (knowing someone is in the
    * class reveals their value). Distinct l-diversity requires every class
    * to contain ≥ l distinct sensitive values; this returns the
    * distribution over diversity levels — one row per distinct-sensitive
    * count: how many classes sit at that level, how many records they
    * hold, and whether the level violates the caller's l (below_l classes
    * need generalization or suppression before release).
    *
    * Scale shape: one QI-keyed aggregation (count + count-distinct over
    * the class — map-side combinable) and one bounded rollup over
    * diversity levels; output is O(distinct levels). */
  def lDiversityAudit(df: org.apache.spark.sql.DataFrame,
                      qiCols: Seq[Column], sensitiveCol: Column,
                      l: Int): org.apache.spark.sql.DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be at least 2, got $l")
    df.groupBy(qiCols: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitiveCol).as("n_sensitive"))
      .groupBy(col("n_sensitive"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))
      .withColumn("below_l", (col("n_sensitive") < l).cast("int"))
  }
}
