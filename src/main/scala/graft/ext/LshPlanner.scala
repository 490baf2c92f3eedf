package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LSH banding PARAMETER PLANNER — the design-time companion of the LSH
  * operators ([[Dedup.lshCandidatePairs]] tuning, [[Dedup.lshEval]] /
  * blocking-quality a-posteriori evaluation): BEFORE committing a (bands,
  * rows-per-band) split of the MinHash budget, predict each candidate
  * split's recall, precision and candidate-pair volume from the closed-form
  * S-curve and a measured corpus similarity histogram, and select the
  * cheapest split that clears the caller's recall floor.
  *
  * Theory (Leskovec–Rajaraman–Ullman, Mining of Massive Datasets §3.4): a
  * pair with Jaccard similarity s collides in at least one of b bands of r
  * rows with probability  P(s) = 1 − (1 − s^r)^b.  The planner evaluates
  * P over every divisor split b·r = numHashes and every similarity
  * hundredth c ∈ [1,100] in EXACT integer arithmetic —
  *   P_bp(c) = (10000·(Q^b − (Q − c^r)^b)) div Q^b,  Q = 100^r
  * (every product rides in DECIMAL(38,0), and the ×10000 is folded into the
  * divisor as Q^b/10^4 = 100^(numHashes−2) — an exact cancellation — so the
  * largest term over the whole documented budget of 18 is 100^18 = 10^36)
  * — the curve replays bit-for-bit on any engine with 128-bit integers.
  *
  * Corpus stats: the similarity histogram comes from an id-mod sample (the
  * q104 idiom — a mod-sample keeps a fixed fraction of TRUE pairs at any
  * scale, unlike an id range) via the exact shingle posting join, bucketed
  * at hundredths by integer division. Pairs sharing no shingle have
  * similarity 0 exactly, where P(0) = 0 — so the posting join IS the
  * complete histogram for every expectation below. Shingles above the
  * `maxDf` document-frequency cap are dropped from the stats universe
  * (sizes and intersections consistently — the [[Dedup.cosinePairs]] guard,
  * inactive at test SF) so boilerplate grams cannot make the sample join
  * quadratic.
  *
  * Per split the planner reports: `s50_centis` (the curve's 50% threshold
  * — where the band structure starts catching pairs), `p_at_target_bp`
  * (collision probability at the caller's target similarity),
  * `exp_cand_x10k` / `exp_true_x10k` (Σ h(c)·P_bp(c) over all / over
  * target-and-above buckets — expected candidate and true-candidate pair
  * counts, scaled ×10000), `recall_bp` / `precision_bp` (expectations over
  * the measured histogram), and `selected` — 1 on the single split the
  * planning rule picks: among splits clearing `minRecallBp`, fewest
  * expected candidates; if none clears, highest recall; ties to fewer
  * bands. Exactly one row carries selected = 1.
  *
  * Scale shape: the stats pass is one sample-bounded posting join (the
  * caller sizes `sampleMod` so the sample stays ~10^5 docs at any corpus
  * size) + one map-side-combined histogram aggregation; the curve is a
  * literal grid × 100 rows of pure expressions; metrics are a bounded
  * aggregation and the selection is one broadcast 1-row join. Nothing
  * corpus-scale shuffles beyond the sampled postings.
  */
object LshPlanner {

  /** Integer power by fold — an exact IEEE-free product chain, identical in
    * any engine (the exponent is a tiny literal-grid value). The fold rides
    * in DECIMAL(38,0) — not LONG — because the b=1 split needs
    * 100^numHashes, which leaves the long range at numHashes = 10 (10^20);
    * decimal(38,0) carries the full documented budget of 18 (10^36). */
  private def ipow(base: Column, e: Column): Column =
    aggregate(sequence(lit(1), e),
      lit(java.math.BigDecimal.ONE).cast("decimal(38,0)"),
      (acc, _) => acc * base.cast("decimal(38,0)"))

  def planBands(docs: DataFrame, idCol: String, textCol: String,
                shingleN: Int = 3, numHashes: Int = 8,
                targetCentis: Int = 80, minRecallBp: Int = 9000,
                sampleMod: Int = 5, maxDf: Int = 1000): DataFrame = {
    require(numHashes >= 2 && numHashes <= 18,
      s"numHashes must be in [2, 18] (decimal(38,0) power bound), got $numHashes")
    require(targetCentis >= 1 && targetCentis <= 100,
      s"targetCentis must be in [1, 100], got $targetCentis")
    require(sampleMod >= 1, s"sampleMod must be positive, got $sampleMod")
    val spark = docs.sparkSession
    import spark.implicits._

    // ---- corpus stats: sampled exact-similarity histogram (hundredths) ----
    val sub = docs.filter(col(idCol) % sampleMod === 0)
    val sRaw = Dedup.explodedShingles(sub, idCol, textCol, shingleN)
    val dfOk = sRaw.groupBy(col("sg")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxDf).select("sg")
    val s = sRaw.join(dfOk, "sg")
    val counts = s.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val shared = s.as("a").join(s.as("b"),
        col(s"a.sg") === col(s"b.sg") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("_a"), col(s"b.$idCol").as("_b"))
      .agg(count(lit(1)).as("shared"))
    val hist = shared
      .join(counts.select(col(idCol).as("_a"), col("n").as("na")), "_a")
      .join(counts.select(col(idCol).as("_b"), col("n").as("nb")), "_b")
      .select(expr("(100 * shared) div (na + nb - shared)").as("hc"))
      .groupBy(col("hc")).agg(count(lit(1)).as("h"))

    // ---- the S-curve over the divisor grid, exact integers ----
    val grid = (1 to numHashes).filter(numHashes % _ == 0)
      .map(b => (b, numHashes / b)).toDF("bands", "rows_per_band")
    val curve = grid
      .withColumn("c", explode(sequence(lit(1), lit(100))))
      .withColumn("cr", ipow(col("c").cast("long"), col("rows_per_band")))
      .withColumn("q", ipow(lit(100L), col("rows_per_band")))
      .withColumn("mb", ipow(col("q") - col("cr"), col("bands")))
      .withColumn("qb", ipow(col("q"), col("bands")))
      // p_bp = floor(10000·(qb − mb) / qb). Multiplying first would need
      // 10^4·10^36 = 10^40 digits at the top of the budget, so use the
      // exact identity 10000·X div 100^n = X div 100^(n−2) (both sides
      // divided by the common 10^4; numHashes ≥ 2 guarantees n ≥ 2).
      .withColumn("_qdiv", lit(new java.math.BigDecimal(
        java.math.BigInteger.valueOf(100).pow(numHashes - 2)))
        .cast("decimal(38,0)"))
      .withColumn("p_bp", expr("cast((qb - mb) div _qdiv as bigint)"))
      .drop("_qdiv")

    // ---- expectations against the measured histogram ----
    val withH = curve.join(hist, col("c") === col("hc"), "left")
      .withColumn("h", coalesce(col("h"), lit(0L)))
    val metrics = withH.groupBy(col("bands"), col("rows_per_band"))
      .agg(
        min(when(col("p_bp") >= 5000, col("c"))).cast("long").as("s50_centis"),
        max(when(col("c") === targetCentis, col("p_bp"))).as("p_at_target_bp"),
        sum(col("h") * col("p_bp")).as("exp_cand_x10k"),
        sum(when(col("c") >= targetCentis, col("h") * col("p_bp"))
          .otherwise(0L)).as("exp_true_x10k"),
        sum(when(col("c") >= targetCentis, col("h")).otherwise(0L)).as("true_pairs"))
      .withColumn("recall_bp",
        when(col("true_pairs") > 0, expr("exp_true_x10k div true_pairs")))
      .withColumn("precision_bp",
        when(col("exp_cand_x10k") > 0,
          expr("(10000 * exp_true_x10k) div exp_cand_x10k")))

    // ---- selection: one broadcast 1-row max-key join, no window ----
    val keyed = metrics
      .withColumn("_qual",
        (coalesce(col("recall_bp"), lit(-1L)) >= minRecallBp).cast("int"))
      .withColumn("_key", when(col("_qual") === 1, -col("exp_cand_x10k"))
        .otherwise(coalesce(col("recall_bp"), lit(-1L))))
      .withColumn("_nb", -col("bands").cast("long"))
    val best = keyed.groupBy()
      .agg(max(struct(col("_qual").as("q"), col("_key").as("k"),
        col("_nb").as("nb"))).as("_best"))
    keyed.crossJoin(broadcast(best))
      .withColumn("selected",
        (struct(col("_qual").as("q"), col("_key").as("k"),
          col("_nb").as("nb")) === col("_best")).cast("int"))
      .drop("_qual", "_key", "_nb", "_best")
  }
}
