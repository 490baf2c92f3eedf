package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RFC 9309 (robots.txt) longest-match rule resolution — ONE argmax
  * definition shared by every consumer, so the q209 per-URL filter and
  * the q213 frontier gate can never drift on the tie rule.
  *
  * Semantics: among a site's rules MATCHING the candidate path, the
  * most specific wins — specificity is the PATTERN LENGTH AS WRITTEN
  * (wildcards and the anchor count toward it, the choice Google's
  * open-sourced robots.txt parser makes) — and an allow/disallow tie at
  * equal length resolves to allow; no matching rule means allow. Two
  * match tiers share that single argmax:
  *
  *   - [[verdictPerRow]] / [[resolveDistinct]]: the PREFIX subset (rule
  *     paths are literal prefixes) — what every REP implementation must
  *     support, and a pure startsWith predicate;
  *   - [[verdictPerRowWild]]: full RFC 9309 §2.2.3 special characters —
  *     `*` matches any character run, a TRAILING `$` anchors the match
  *     at the path end (mid-pattern `$` is literal); real robots.txt
  *     use both heavily. Rules compile once to anchored regexes on the
  *     bounded broadcast side ([[compileWildcardRules]]); the corpus
  *     side evaluates one RLIKE per (path, rule) candidate.
  *
  * Scale shapes, pick per input:
  *   - [[verdictPerRow]]: candidates already unique per output row (the
  *     q209 shape — one URL per document). One broadcast join + one
  *     groupBy argmax.
  *   - [[resolveDistinct]]: candidate (site, path) pairs repeat heavily
  *     (a link frontier: thousands of pages cite the same href). The
  *     rule join runs on the DISTINCT pairs only; callers join the tiny
  *     verdict table back — rule evaluation cost scales with the
  *     frontier's vocabulary, not the corpus.
  */
object Robots {

  /** The longest-match winner as a struct argmax: max over matching
    * rules of (path length, allow flag, path) — length first, allow
    * breaking the equal-length tie, path as a determinism belt. */
  private def winner =
    max(when(col("r_path").isNotNull,
      struct(length(col("r_path")).as("l"), col("r_allow").as("a"),
        col("r_path").as("p"))))

  /** Verdict per candidate row. `cands` carries `site`, `path`, and the
    * caller's key columns; `rules` is the bounded (r_site, r_path,
    * r_allow∈{0,1}) table (broadcast). Output: keyCols + allowed +
    * matched_path. */
  def verdictPerRow(cands: DataFrame, rules: DataFrame,
                    keyCols: Seq[String]): DataFrame =
    cands
      .join(broadcast(rules),
        col("site") === col("r_site") &&
          col("path").startsWith(col("r_path")), "left")
      .groupBy(keyCols.map(col): _*)
      .agg(winner.as("m"))
      .select(keyCols.map(col) ++ Seq(
        coalesce(col("m.a") === 1, lit(true)).as("allowed"),
        col("m.p").as("matched_path")): _*)

  /** Verdicts for the DISTINCT (site, path) pairs in `cands`. */
  def resolveDistinct(cands: DataFrame, rules: DataFrame): DataFrame =
    verdictPerRow(cands.select(col("site"), col("path")).distinct(),
      rules, Seq("site", "path"))

  /** Compile a wildcard rule table: adds `r_regex`, the anchored regex
    * translation of `r_path` — every regex metacharacter escaped EXCEPT
    * `*` (→ `.*`), a trailing `$` kept as the end anchor, `^` prepended
    * (an unanchored tail = the REP's match-a-prefix semantics).
    * Specificity stays `length(r_path)` — the pattern as written. */
  def compileWildcardRules(rules: DataFrame): DataFrame = {
    val hasAnchor = col("r_path").endsWith("$")
    val core = when(hasAnchor,
      expr("substring(r_path, 1, length(r_path) - 1)"))
      .otherwise(col("r_path"))
    val escaped = regexp_replace(core, "([.^$+?(){}\\[\\]|\\\\])", "\\\\$1")
    val starred = regexp_replace(escaped, "\\*", ".*")
    rules.withColumn("r_regex",
      concat(lit("^"), starred, when(hasAnchor, lit("$")).otherwise(lit(""))))
  }

  /** [[verdictPerRow]] under full RFC 9309 wildcard matching: same join
    * shape (broadcast rules, per-key argmax via the SHARED [[winner]] —
    * the tie rule cannot drift between the prefix and wildcard tiers),
    * with the prefix predicate replaced by the compiled-regex RLIKE.
    * The per-row pattern compile is bounded by the broadcast rule count,
    * not the corpus. */
  def verdictPerRowWild(cands: DataFrame, rules: DataFrame,
                        keyCols: Seq[String]): DataFrame =
    cands
      .join(broadcast(compileWildcardRules(rules)),
        col("site") === col("r_site") && expr("path RLIKE r_regex"), "left")
      .groupBy(keyCols.map(col): _*)
      .agg(winner.as("m"))
      .select(keyCols.map(col) ++ Seq(
        coalesce(col("m.a") === 1, lit(true)).as("allowed"),
        col("m.p").as("matched_path")): _*)
}
