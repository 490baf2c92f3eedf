package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RFC 9309 (robots.txt) longest-match rule resolution — ONE argmax
  * definition shared by every consumer, so the q209 per-URL filter and
  * the q213 frontier gate can never drift on the tie rule.
  *
  * Semantics (the REP's required deterministic subset — wildcards out of
  * scope): among a site's rules whose path is a PREFIX of the candidate
  * path, the longest path wins; an allow/disallow tie at equal length
  * resolves to allow; no matching rule means allow.
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
}
