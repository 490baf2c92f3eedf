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

  /** Parse robots.txt TEXTS relationally: (site, txt) → one row per
    * directive (site, gid, i, name, value, truncated) where `gid`
    * numbers the RFC 9309
    * GROUPS within each site's file — a run of consecutive `User-agent:`
    * lines heads one group (multiple tokens share the group's rules),
    * and every following directive line belongs to it until the next
    * such run. Comments (`#` to end of line) and blank lines are
    * stripped; names lowercase, values verbatim-trimmed.
    *
    * Shape: posexplode the line array, one lag + one running-sum window
    * per site (group-islands), both over the site partition — file
    * parsing costs two bounded windows over O(lines), never a shuffle of
    * the corpus (robots.txt is per-HOST data: thousands of rows, not
    * billions). */
  /** RFC 9309 §2.5 processing limit: a crawler must enforce a parse cap
    * of at least 500 kibibytes — an unbounded parse of a hostile host's
    * multi-gigabyte robots.txt is a resource attack on the fetcher. The
    * cap is counted in CHARACTERS (robots.txt is ASCII in practice, so
    * chars = octets; a relational byte-exact cut would split multi-byte
    * sequences). Content past the cap is ignored, and a line the cut
    * severs is dropped WHOLE — a half directive must not parse as a
    * different rule. */
  val MaxParseChars: Int = 500 * 1024

  def parseDirectives(txts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("site")).orderBy(col("i"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    txts
      // the §2.5 cap: window the text, drop the severed final line, and
      // make the cut OBSERVABLE (`truncated` rides every directive row —
      // a policy consumer can alert on hosts whose rules were cut)
      .withColumn("_trunc", length(col("txt")) > MaxParseChars)
      .withColumn("_win", when(col("_trunc"),
          expr(s"substring(txt, 1, $MaxParseChars)"))
        .otherwise(col("txt")))
      .withColumn("_txt", when(col("_trunc"),
          expr("substring(_win, 1, length(_win) - " +
            "length(substring_index(_win, '\n', -1)))"))
        .otherwise(col("_win")))
      .select(col("site"), col("_trunc").as("truncated"),
        posexplode(split(col("_txt"), "\n")).as(Seq("i", "raw")))
      .select(col("site"), col("truncated"), col("i"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("ln"))
      .filter(col("ln") =!= "" && col("ln").contains(":"))
      .select(col("site"), col("truncated"), col("i"),
        lower(trim(substring_index(col("ln"), ":", 1))).as("name"),
        trim(expr("substring(ln, instr(ln, ':') + 1)")).as("value"))
      .withColumn("_ua", col("name") === "user-agent")
      .withColumn("_new",
        (col("_ua") && !coalesce(lag(col("_ua"), 1).over(w), lit(false)))
          .cast("int"))
      .withColumn("gid", sum(col("_new")).over(run))
      .select(col("site"), col("gid"), col("i"), col("name"), col("value"),
        col("truncated"))
  }

  /** The group(s) a crawler obeys per site (RFC 9309 §2.2.1): among
    * groups carrying a user-agent token that is `*` or a
    * case-insensitive PREFIX of the crawler's product token, the
    * longest token wins (`*` = specificity 0; the Google-parser-
    * compatible direction — a LONGER token like `graftbot-images` never
    * captures UA `graftbot`). EVERY group at the winning specificity is
    * returned, because the RFC merges the rules of groups addressing
    * the same token — and matching prefix tokens of equal maximal
    * length are necessarily the SAME token, so this is exactly the
    * RFC's merge, never a mix of different tokens. Sites with no
    * matching group get no row (nothing to obey = allow all). Returns
    * (site, gid), possibly several gids per site. */
  def selectGroup(directives: DataFrame, userAgent: String): DataFrame = {
    val toks = directives
      .filter(col("name") === "user-agent")
      .select(col("site"), col("gid"), lower(col("value")).as("_tok"))
      // An EMPTY token (a "User-agent:" line with blank value) must not
      // match: startsWith("") is vacuously true with specificity 0,
      // which would tie `*` and break the invariant that equal-max-
      // length prefix tokens are necessarily the same token.
      .filter(col("_tok") =!= "")
      .filter(col("_tok") === "*" ||
        lit(userAgent.toLowerCase).startsWith(col("_tok")))
      .withColumn("_spec",
        when(col("_tok") === "*", lit(0)).otherwise(length(col("_tok"))))
    toks
      .join(toks.groupBy(col("site")).agg(max(col("_spec")).as("_spec")),
        Seq("site", "_spec"))
      .select(col("site"), col("gid"))
      .distinct()
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
