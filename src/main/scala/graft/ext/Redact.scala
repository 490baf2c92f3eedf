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

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE '07) — the
    * skewness-attack complement that completes the privacy triad with
    * [[kAnonymityAudit]] and [[lDiversityAudit]]: a QI class can be
    * k-anonymous AND l-diverse yet still leak if its sensitive-value
    * DISTRIBUTION differs sharply from the corpus-wide one (e.g. a class
    * where 90% share a value the corpus holds at 10% — an attacker's
    * posterior jumps even though l distinct values are present). For a
    * categorical sensitive attribute the class-to-global distance is the
    * variational distance (= EMD under uniform ground distance):
    * TV = ½ Σ_v |p_class(v) − p_global(v)|, and t-closeness requires
    * TV ≤ t for every class.
    *
    * Exact rational arithmetic so every engine agrees bit-for-bit: with
    * per-class cell counts cnt(v), class size cs, global counts g(v) and
    * corpus size n,   TV = num / (2·cs·n)   where
    *   num = Σ_{v in class} |cnt(v)·n − g(v)·cs| + cs·(n − Σ_{v in class} g(v))
    * (the second term folds in every category ABSENT from the class:
    * |0·n − g·cs| summed over them — no densifying cross join needed).
    * Reported in basis points via integral division: tv_bp = (5000·num)
    * div (cs·n), computed on DECIMAL(38,0) so the products survive
    * corpus sizes up to ~10^12 rows without wraparound (the HUGEINT `//`
    * replay in DuckDB matches because all terms are non-negative, where
    * truncating and floor division coincide).
    *
    * Returns the distribution over tv buckets of width `bucketBp`: one row
    * per bucket — n_classes, n_rows, and above_t (bucket lower edge ≥ tBp;
    * `tBp` must be a multiple of `bucketBp` so the flag is constant within
    * a bucket).
    *
    * Scale shape: one (QI, sensitive)-keyed aggregation (map-side
    * combined; state bounded by |QI classes|·|sensitive domain|), a
    * broadcast join of the O(|sensitive domain|)-row global distribution,
    * one QI-keyed aggregation whose per-class state is bounded by the
    * sensitive domain, and a bounded bucket rollup. No windows, no
    * cross join, no collect. */
  def tClosenessAudit(df: org.apache.spark.sql.DataFrame,
                      qiCols: Seq[Column], sensitiveCol: Column,
                      tBp: Int, bucketBp: Int = 500): org.apache.spark.sql.DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(tBp > 0 && tBp <= 10000, s"tBp must be in (0, 10000], got $tBp")
    require(bucketBp > 0 && tBp % bucketBp == 0,
      s"tBp ($tBp) must be a positive multiple of bucketBp ($bucketBp)")
    val dec = "decimal(38,0)"
    // NULL sensitive values are a distribution category of their own, not
    // rows to drop: fold them to a sentinel BEFORE aggregating, otherwise
    // the null-unsafe global join would silently exclude them from class
    // sizes and TV — a privacy audit understating exactly the rows whose
    // value is unknown. The cast-to-string is injective for audit purposes
    // (distinct values stay distinct) and lets one sentinel serve any type.
    val base = df.select((qiCols :+
      coalesce(sensitiveCol.cast("string"), lit("__null__")).as("_sens")): _*)
    val qiNames = base.columns.dropRight(1)
    // Per-(class, value) cell counts — the only corpus-scale shuffle.
    val cells = base.groupBy(base.columns.map(col): _*).agg(count(lit(1)).as("cnt"))
    // Global sensitive distribution (tiny: one row per domain value) + n.
    val global = base.groupBy(col("_sens")).agg(count(lit(1)).as("g"))
    val n = base.groupBy().agg(count(lit(1)).as("n"))
    val perClass = cells
      .join(broadcast(global), "_sens")
      .join(broadcast(n))
      .groupBy(qiNames.map(col): _*)
      .agg(
        sum(col("cnt")).cast(dec).as("cs"),
        sum(col("g")).cast(dec).as("g_present"),
        first(col("n")).cast(dec).as("n"),
        // Σ |cnt·n − g·cs| needs cs, known only after the agg — so carry the
        // bounded (cnt, g) cells through and fold them in one projection.
        collect_list(struct(col("cnt").cast(dec).as("cnt"),
          col("g").cast(dec).as("g"))).as("cells"))
      .withColumn("num",
        aggregate(col("cells"), lit(0).cast(dec),
          (acc, x) => acc + abs(x.getField("cnt") * col("n") -
            x.getField("g") * col("cs"))) +
          col("cs") * (col("n") - col("g_present")))
      .withColumn("tv_bp", expr(s"(num * 5000) div (cs * n)"))
    perClass
      .withColumn("tv_bucket", expr(s"tv_bp div $bucketBp"))
      .groupBy(col("tv_bucket"))
      .agg(count(lit(1)).as("n_classes"), sum(col("cs")).cast("long").as("n_rows"))
      .withColumn("above_t", (col("tv_bucket") >= tBp / bucketBp).cast("int"))
  }
}
