package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{DataQuality, Sketch}
import graft.util.Output.tinySort
import graft.util.Tables.load

/** Data-quality / profiling operator surface ([[graft.ext.DataQuality]]):
  * column profiles, constraint-violation counts, quantile outlier trimming
  * — the governance layer of a warehouse / corpus pipeline.
  */
object ProfilingQueries {

  /** q71 — per-column profile of `documents`: row/null/distinct counts +
    * string-rendered min/max, ONE aggregation action (multi-distinct plans
    * through Expand; output is |cols| rows from any input size). */
  def q71ColumnProfile(spark: SparkSession, dir: String): DataFrame =
    DataQuality.columnProfile(load(spark, dir, "documents"),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
      .transform(tinySort(_, col("column")))

  /** q72 — constraint-violation report across three tables: per-table checks
    * fuse into one conditional-count aggregation each (one scan per table no
    * matter how many checks); referential integrity via key anti-join;
    * duplicate-PK via keyed count. Output: one row per check. */
  def q72DqChecks(spark: SparkSession, dir: String): DataFrame = {
    val li = DataQuality.constraintCounts(load(spark, dir, "lineitem"), Seq(
      "li_negative_price" -> (col("l_extendedprice") < 0),
      "li_bad_discount" -> (col("l_discount") < 0 || col("l_discount") > 1),
      "li_null_quantity" -> col("l_quantity").isNull))
    val ord = DataQuality.constraintCounts(load(spark, dir, "orders"), Seq(
      "ord_null_orderdate" -> col("o_orderdate").isNull,
      "ord_nonpositive_total" -> (col("o_totalprice") <= 0)))
    val orphan = DataQuality.orphanCount(
        load(spark, dir, "lineitem"), "l_orderkey",
        load(spark, dir, "orders"), "o_orderkey")
      .select(lit("li_orphan_orderkey").as("check"), col("n_violations"))
    val dup = load(spark, dir, "customer")
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1).agg(count(lit(1)).as("n_violations"))
      .select(lit("cust_dup_key").as("check"), col("n_violations"))
    li.select(col("check"), col("n_violations"))
      .unionByName(ord.select(col("check"), col("n_violations")))
      .unionByName(orphan).unionByName(dup)
      .withColumnRenamed("check", "check_name")
      .transform(tinySort(_, col("check_name")))
  }

  /** q73 — per-source length-outlier trim stats: exact p99 cap on n_chars
    * (vocabulary-sized caps broadcast back), keep/drop counts per source. */
  def q73LengthTrim(spark: SparkSession, dir: String): DataFrame =
    DataQuality.quantileTrimStats(load(spark, dir, "documents"),
        "source", "n_chars", q = 0.99)
      .transform(tinySort(_, col("source")))

  /** q101 — equi-width histogram ([[DataQuality.equiWidthHistogram]]):
    * 20 bins over observed [min, max] of order totals; the two-pass
    * (1-row stats broadcast, then map-side binning) profile operator. Bin
    * boundaries keep the raw IEEE doubles — no rounding — so the oracle
    * replays them bit-identically. */
  def q101Histogram(spark: SparkSession, dir: String): DataFrame =
    DataQuality.equiWidthHistogram(load(spark, dir, "orders"),
        "o_totalprice", nBins = 20)
      .transform(tinySort(_, col("bin")))

  /** q106 — KMV distinct-count sketch ([[graft.ext.Sketch.kmvDistinct]]):
    * per-priority distinct-customer cardinality, estimated from the k=256
    * smallest md5-derived 60-bit hashes. The sketch's map-side partials are
    * bounded at k longs per group per partition — the 100 TB formulation of
    * approximate COUNT(DISTINCT) (the exact column rides along as the
    * test-scale comparison; production drops it). The oracle replays hash,
    * sketch and exact-integer estimator (HUGEINT `//` ≡ DECIMAL div). */
  def q106KmvDistinct(spark: SparkSession, dir: String): DataFrame =
    // the local single-file parquet arrives as ONE split, which serializes
    // the map-side sketch build; a production table arrives in thousands of
    // splits. Round-robin to session parallelism (one narrow shuffle of
    // three small columns) so the bench measures the parallel shape.
    Sketch.kmvDistinct(
        load(spark, dir, "orders")
          .repartition(spark.sparkContext.defaultParallelism),
        "o_orderpriority", "o_custkey", k = 256)
      .transform(tinySort(_, col("o_orderpriority")))

  /** q108 — two-level KMV rollup ([[graft.ext.Sketch.kmvRollup]]): the
    * per-priority sketches of q106 PLUS a global `__all__` row whose sketch
    * is the distributed MERGE of the per-group sketches — the property that
    * makes sketches matter at 100 TB (per-day/per-corpus summaries combine
    * without re-reading data, and merge ≡ direct-over-union exactly). The
    * oracle replays both levels; equality of the merged row with a directly
    * built global sketch is the SketchSpec law. */
  def q108KmvRollup(spark: SparkSession, dir: String): DataFrame =
    Sketch.kmvRollup(
        load(spark, dir, "orders")
          .repartition(spark.sparkContext.defaultParallelism),
        "o_orderpriority", "o_custkey", k = 256)
      .transform(tinySort(_, col("scope")))

  /** q110 — Count-Min Sketch frequency estimation
    * ([[graft.ext.Sketch.cmsLongForm]]/[[graft.ext.Sketch.cmsMerge]]/
    * [[graft.ext.Sketch.cmsEstimate]]): per-DAY 4×256 long-form sketches
    * over event user activity, merged element-wise into the global sketch
    * (the incremental-maintenance path: daily sketches combine without
    * re-reading events, and merge ≡ direct-over-union exactly since counts
    * are additive — which is why the oracle may compute the global grid
    * directly), then point-queried for the top-10 users by exact count.
    * Output carries the exact count next to the estimate: the CMS
    * overestimate law (estimate ≥ truth, collisions only add) is visible
    * as a non-negative `overcount` column, and at production scale the
    * exact side is what the sketch replaces. */
  def q110CmsFreq(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
    val perDay = Sketch.cmsLongForm(
      ev.withColumn("_day", to_date(col("ts"))), "_day", "user_id")
    val probes = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("user_id").asc)
      .limit(10)
    Sketch.cmsEstimate(Sketch.cmsMerge(perDay), probes, "user_id")
      .withColumn("overcount", col("cms_estimate") - col("exact_cnt"))
      .transform(tinySort(_, col("user_id")))
  }

  /** q113 — mergeable QUANTILE sketch rollup
    * ([[graft.ext.Sketch.quantileRollup]]), completing the sketch triad
    * (q106/q108 KMV = cardinality, q110 CMS = frequency, this = rank):
    * per-source document-length percentiles from a bottom-k-by-row-hash
    * sample whose map-side partials are bounded at k (hash, value) pairs —
    * the 100 TB formulation of per-group percentile profiling (q73 is the
    * exact twin). The `__all__` row is the lossless second-level MERGE of
    * the per-source sketches (bottom-k of a union = bottom-k of the merged
    * bottom-k's — which is why the oracle may compute the global sample
    * directly); estimates are positional integers from the sample, the
    * exact interpolated percentiles ride along as the test-scale comparison
    * columns. */
  def q113QuantileSketch(spark: SparkSession, dir: String): DataFrame =
    Sketch.quantileRollup(
        load(spark, dir, "documents")
          .repartition(spark.sparkContext.defaultParallelism),
        "source", "doc_id", "n_chars", qBps = Seq(50, 90), k = 256)
      .transform(tinySort(_, col("scope")))

  /** q114 — KMV set algebra: day-over-day audience-overlap estimation from
    * per-day sketches alone ([[graft.ext.Sketch.kmvOverlapEstimates]],
    * Beyer et al. SIGMOD '07). Each consecutive-day pair's intersection
    * cardinality and Jaccard are estimated from the two days' k=64 sketches
    * (coordinated samples under the shared hash) — the 100 TB formulation
    * of "how much do these corpora/shards/days overlap", answered from
    * O(k) state per group instead of the corpus-scale distinct join that
    * computes the exact comparison columns riding along. All estimator
    * arithmetic is exact-integer, so the oracle replays it bit-for-bit. */
  def q114SketchOverlap(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    val agg = udaf(new graft.ext.KmvAggregator(k))
    val ev = load(spark, dir, "events")
      .select(to_date(col("ts")).cast("string").as("day"), col("user_id"))
    val sk = ev.select(col("day"), Sketch.kmvHash(col("user_id")).as("_h"))
      .groupBy(col("day")).agg(agg(col("_h")).as("_sk"))
    // consecutive-day pairs via a precomputed next-day key: EQUI-join (the
    // sketch frame is days-sized, but plan hygiene is free here)
    val pairs = sk.select(col("day").as("day_a"),
        date_add(to_date(col("day")), 1).cast("string").as("_nx"),
        col("_sk").as("_ska"))
      .join(sk.select(col("day").as("day_b"), col("_sk").as("_skb")),
        col("_nx") === col("day_b"))
      .drop("_nx")
    val est = Sketch.kmvOverlapEstimates(pairs, k)
    // exact comparison columns (test scale): the distinct self-join the
    // sketch path replaces at production scale. The (day, user) frame
    // feeds THREE consumers (sizes + both sides of the intersection join)
    // — materialize once (the q53 discipline; it is days·users small).
    val du = ev.distinct().localCheckpoint()
    val nd = du.groupBy(col("day")).agg(count(lit(1)).as("_n"))
    val xb = du.select(col("day").as("day_b"), col("user_id").as("_ub"))
    val xi = du.select(col("day").as("day_a"),
        date_add(to_date(col("day")), 1).cast("string").as("_nx"), col("user_id"))
      .join(xb, col("_nx") === col("day_b") && col("user_id") === col("_ub"))
      .groupBy(col("day_a"), col("day_b"))
      .agg(count(lit(1)).as("exact_intersection"))
    // LEFT join + coalesce 0: a day pair with NO shared users has no xi
    // group, but 100%-churn pairs are exactly the rows a retention report
    // must SHOW, not drop (the sketch side builds every consecutive pair)
    est.join(broadcast(xi), Seq("day_a", "day_b"), "left")
      .withColumn("exact_intersection", coalesce(col("exact_intersection"), lit(0L)))
      .join(broadcast(nd.select(col("day").as("day_a"), col("_n").as("_na"))), Seq("day_a"))
      .join(broadcast(nd.select(col("day").as("day_b"), col("_n").as("_nb"))), Seq("day_b"))
      .select(col("day_a"), col("day_b"), col("union_k"), col("shared_k"),
        col("est_union"), col("est_intersection"), col("est_jaccard_bp"),
        (col("_na") + col("_nb") - col("exact_intersection")).as("exact_union"),
        col("exact_intersection"))
      .transform(tinySort(_, col("day_a")))
  }

  /** q126 — KMV sketch difference & containment
    * ([[graft.ext.Sketch.kmvOverlapEstimates]]' completion of the set
    * algebra): per-priority bottom-64 sketches of o_custkey, ALL priority
    * pairs (groups² — 10 rows, bounded by contract, so the broadcast
    * nested-loop pair join is the right plan at any corpus size: the
    * frame being squared is the GROUP table, never the data), and from
    * each pair's coordinated union sample: difference cardinalities
    * |A∖B| / |B∖A| and asymmetric containments |A∩B|/|A| — the numbers a
    * dedup planner reads as "how much of shard A is already inside B",
    * answered from O(k) state instead of a distinct join. Exact
    * comparison columns ride along at test scale (the distinct self
    * equi-join the sketch path replaces). */
  def q126SketchDiff(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    val agg = udaf(new graft.ext.KmvAggregator(k))
    val ords = load(spark, dir, "orders")
      .select(col("o_orderpriority").as("prio"), col("o_custkey"))
    val sk = ords.select(col("prio"), Sketch.kmvHash(col("o_custkey")).as("_h"))
      .groupBy(col("prio")).agg(agg(col("_h")).as("_sk"))
      .localCheckpoint() // feeds both sides of the pair join — build once
    val pairs = sk.select(col("prio").as("prio_a"), col("_sk").as("_ska"))
      .join(broadcast(sk.select(col("prio").as("prio_b"), col("_sk").as("_skb"))),
        col("prio_a") < col("prio_b"))
    val est = Sketch.kmvOverlapEstimates(pairs, k)
    // exact side: distinct (prio, custkey) frame — THREE consumers
    // (per-prio sizes + both legs of the intersection equi-join)
    val du = ords.distinct().localCheckpoint()
    val np = du.groupBy(col("prio")).agg(count(lit(1)).as("_n"))
    val xi = du.select(col("prio").as("prio_a"), col("o_custkey"))
      .join(du.select(col("prio").as("prio_b"), col("o_custkey").as("_cb")),
        col("o_custkey") === col("_cb") && col("prio_a") < col("prio_b"))
      .groupBy(col("prio_a"), col("prio_b"))
      .agg(count(lit(1)).as("_inter"))
    est
      .join(broadcast(xi), Seq("prio_a", "prio_b"), "left")
      .withColumn("_inter", coalesce(col("_inter"), lit(0L)))
      .join(broadcast(np.select(col("prio").as("prio_a"), col("_n").as("_na"))),
        Seq("prio_a"))
      .join(broadcast(np.select(col("prio").as("prio_b"), col("_n").as("_nb"))),
        Seq("prio_b"))
      .select(col("prio_a"), col("prio_b"),
        col("a_k"), col("b_k"), col("shared_k"),
        col("est_only_a"), col("est_only_b"),
        col("cont_a_in_b_bp"), col("cont_b_in_a_bp"),
        (col("_na") - col("_inter")).as("exact_only_a"),
        (col("_nb") - col("_inter")).as("exact_only_b"),
        expr("(10000 * _inter) div _na").as("exact_cont_a_bp"),
        expr("(10000 * _inter) div _nb").as("exact_cont_b_bp"))
      .transform(tinySort(_, col("prio_a"), col("prio_b")))
  }

  /** q136 — CMS inner-product join-size estimation
    * ([[graft.ext.Sketch.cmsJoinSize]], Cormode & Muthukrishnan §4.2 / the
    * AMS F₂ form): estimate the output cardinality of the events-×-events
    * self-join on user_id — the skew-planning question "how big would this
    * join be" — from two 4×256 grids instead of the corpus-scale key join,
    * with the exact inner product alongside so the overestimate law
    * (collisions only add) is visible as a non-negative `overcount`. */
  def q136CmsJoinSize(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
    Sketch.cmsJoinSize(ev, "user_id", ev, "user_id")
  }

  /** q138 — reducer-balance planning audit
    * ([[graft.ext.Skew.reducerBalanceAudit]]): for candidate shuffle
    * widths P ∈ {8, 16, 32}, simulate hash placement of the events
    * user-activity aggregation and report each width's load profile —
    * the "size spark.sql.shuffle.partitions before the job" artifact,
    * and the diagnostic separating "raise P" from "salt the key" (a hot
    * key's max_load_bp grows WITH P). Runs on the key histogram, not the
    * corpus: one map-side-combined groupBy, then O(NDV·3) rows. */
  def q138ReducerBalance(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.Skew
    Skew.reducerBalanceAudit(load(spark, dir, "events"), col("user_id"),
        Seq(8, 16, 32))
      .transform(tinySort(_, col("candidate_p")))
  }

  /** q146 — KMV distinct-count confidence intervals
    * ([[graft.ext.Sketch.kmvDistinctCI]], Beyer et al. SIGMOD '07 §4): the
    * error-bar tier over q106's estimates — distinct users per event type
    * at k = 64 (engaged: every group exceeds k at test SF) with the exact
    * rational ±z/√k interval (√64 = 8, so ε = 2450 bp exactly — no float
    * sqrt crosses the engine boundary) and the `covered` audit flag
    * against the exact count. */
  def q146KmvCI(spark: SparkSession, dir: String): DataFrame =
    Sketch.kmvDistinctCI(
        load(spark, dir, "events")
          .repartition(spark.sparkContext.defaultParallelism),
        "event_type", "user_id", k = 64)
      .transform(tinySort(_, col("event_type")))

  /** q150 — HyperLogLog distinct-count rollup
    * ([[graft.ext.Sketch.hllRollup]]): per-returnflag distinct-part
    * cardinality over lineitem from 64 six-bit registers, plus the
    * `__all__` row merged register-wise (max) from the per-group
    * registers — the idempotent-merge cardinality tier next to q106/q108's
    * KMV. Fully relational long form: the register build is ONE map-side-
    * combined groupBy(max) on ≤ groups·64 keys (the shuffle carries
    * O(groups·m) bytes from any input size), the estimator one exact
    * integral division. The oracle replays hash, bucket/rank split,
    * registers, merge and estimator on HUGEINT. */
  def q150HllRollup(spark: SparkSession, dir: String): DataFrame =
    Sketch.hllRollup(
        load(spark, dir, "lineitem")
          .repartition(spark.sparkContext.defaultParallelism),
        "l_returnflag", "l_partkey")
      .transform(tinySort(_, col("scope")))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q150_hll_rollup" -> (q150HllRollup _),
    "q146_kmv_ci" -> (q146KmvCI _),
    "q136_cms_join_size" -> (q136CmsJoinSize _),
    "q138_reducer_balance" -> (q138ReducerBalance _),
    "q114_sketch_overlap" -> (q114SketchOverlap _),
    "q126_sketch_diff" -> (q126SketchDiff _),
    "q71_column_profile" -> (q71ColumnProfile _),
    "q72_dq_checks" -> (q72DqChecks _),
    "q73_length_trim" -> (q73LengthTrim _),
    "q101_histogram" -> (q101Histogram _),
    "q106_kmv_distinct" -> (q106KmvDistinct _),
    "q108_kmv_rollup" -> (q108KmvRollup _),
    "q110_cms_freq" -> (q110CmsFreq _),
    "q113_quantile_sketch" -> (q113QuantileSketch _))

  /** DuckDB reconstruction of [[Sketch.kmvHash]]: strpos arithmetic over
    * the first 15 hex chars of md5 (60 bits — BIGINT-exact in both
    * engines). */
  private[queries] def hex60(e: String): String =
    (0 until 15).map { i =>
      val shift = java.math.BigInteger.valueOf(16).pow(14 - i)
      s"(strpos('0123456789abcdef', substring(md5($e), ${i + 1}, 1)) - 1) * $shift"
    }.mkString("(", "\n      + ", ")")

  private val ProfileCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  val sql: Map[String, String] = Map(
    /* q150: hash → (bucket, rightmost-1-bit rank) split, register max per
     * (group, bucket), register-wise-max merge for the __all__ row, and
     * the raw-HLL estimator as one HUGEINT integral division. bin() is
     * unpadded in DuckDB, so length(bin(x & -x)) is the bit-length of the
     * lowest-set-bit mask = the FM rank, matching Spark's
     * length(conv(...)). */
    "q150_hll_rollup" ->
      s"""WITH hx AS (
        |  SELECT l_returnflag AS grp, l_partkey,
        |    ${hex60("'hll:' || CAST(l_partkey AS VARCHAR)")} AS hv
        |  FROM lineitem),
        | b AS (SELECT grp, hv % 64 AS bucket, hv // 64 AS rest FROM hx),
        | r AS (SELECT grp, bucket,
        |        CASE WHEN rest = 0 THEN 55
        |             ELSE length(bin(rest & (-rest))) END AS rho FROM b),
        | regs AS (SELECT grp, bucket, MAX(rho) AS rho FROM r GROUP BY grp, bucket),
        | merged AS (SELECT '__all__' AS grp, bucket, MAX(rho) AS rho
        |            FROM regs GROUP BY bucket),
        | allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM merged),
        | z AS (SELECT grp,
        |         CAST(64 - COUNT(*) AS BIGINT) AS n_zero_registers,
        |         SUM(CAST(1 AS HUGEINT) << (62 - rho)) AS zsum
        |       FROM allregs GROUP BY grp),
        | e AS (SELECT grp, n_zero_registers,
        |         (CAST(2904064 AS HUGEINT) * (CAST(1 AS HUGEINT) << 62))
        |           // (CAST(1000 AS HUGEINT) *
        |              (zsum + CAST(n_zero_registers AS HUGEINT)
        |                      * (CAST(1 AS HUGEINT) << 62))) AS est
        |       FROM z),
        | x AS (SELECT COALESCE(grp, '__all__') AS grp,
        |         COUNT(DISTINCT l_partkey) AS exact_distinct
        |       FROM hx GROUP BY ROLLUP(grp))
        |SELECT e.grp AS scope,
        |  CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
        |  e.n_zero_registers,
        |  CAST(e.est AS BIGINT) AS hll_estimate,
        |  CAST((CAST(abs(e.est - x.exact_distinct) AS HUGEINT) * 10000)
        |       // GREATEST(x.exact_distinct, 1) AS BIGINT) AS err_bp
        |FROM e JOIN x USING (grp)
        |ORDER BY scope""".stripMargin,
    /* q146: the q106 replay chain at k = 64 on events, plus the exact
     * rational CI (ε = 2450 bp = 1.96/8) and the covered flag. */
    "q146_kmv_ci" ->
      s"""WITH hx AS (
        |  SELECT event_type AS grp, user_id,
        |    ${hex60("'kmv:' || CAST(user_id AS VARCHAR)")} AS hv
        |  FROM events),
        | d AS (SELECT DISTINCT grp, hv FROM hx),
        | r AS (SELECT grp, hv,
        |         row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn FROM d),
        | a AS (SELECT grp, COUNT(*) AS nd,
        |         MAX(CASE WHEN rn = 64 THEN hv END) AS hk
        |       FROM r GROUP BY grp),
        | x AS (SELECT grp, COUNT(DISTINCT user_id) AS exact_distinct
        |       FROM hx GROUP BY grp),
        | est AS (SELECT a.grp, x.exact_distinct,
        |    LEAST(a.nd, 64) AS sketch_size,
        |    CASE WHEN a.hk IS NULL THEN LEAST(a.nd, 64)
        |         ELSE (CAST(63 AS HUGEINT) * CAST(${Sketch.HashSpace} AS HUGEINT))
        |              // CAST(a.hk AS HUGEINT) END AS kmv_estimate
        |  FROM a JOIN x USING (grp)),
        | ci AS (SELECT *,
        |    CASE WHEN sketch_size < 64 THEN kmv_estimate
        |         ELSE (kmv_estimate * 10000) // 12450 END AS ci_lo,
        |    CASE WHEN sketch_size < 64 THEN kmv_estimate
        |         ELSE (kmv_estimate * 10000) // 7550 END AS ci_hi
        |  FROM est)
        |SELECT grp AS event_type,
        |  CAST(exact_distinct AS BIGINT) AS exact_distinct,
        |  CAST(sketch_size AS BIGINT) AS sketch_size,
        |  CAST(kmv_estimate AS BIGINT) AS kmv_estimate,
        |  CAST(ci_lo AS BIGINT) AS ci_lo, CAST(ci_hi AS BIGINT) AS ci_hi,
        |  CASE WHEN exact_distinct >= ci_lo AND exact_distinct <= ci_hi
        |       THEN 1 ELSE 0 END AS covered
        |FROM ci ORDER BY event_type""".stripMargin,
    "q138_reducer_balance" ->
      s"""WITH hist AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1),
        | keyed AS (SELECT cnt,
        |     ${hex60("'shf:' || CAST(user_id AS VARCHAR)")} AS h
        |   FROM hist),
        | loads AS (SELECT p.p, keyed.h % p.p AS reducer,
        |     SUM(cnt) AS load, COUNT(*) AS n_keys
        |   FROM keyed, (VALUES (8),(16),(32)) p(p)
        |   GROUP BY 1, 2)
        |SELECT CAST(p AS INTEGER) AS candidate_p,
        |  CAST(COUNT(*) AS BIGINT) AS n_used,
        |  CAST(SUM(load) AS BIGINT) AS n_rows,
        |  CAST(MAX(load) AS BIGINT) AS max_rows,
        |  CAST(MAX(n_keys) AS BIGINT) AS max_keys,
        |  CAST((MAX(load) * p * 10000) // SUM(load) AS BIGINT) AS max_load_bp
        |FROM loads GROUP BY p ORDER BY candidate_p""".stripMargin,
    "q136_cms_join_size" ->
      s"""WITH rs AS (SELECT r FROM (VALUES (0),(1),(2),(3)) t(r)),
        | cells AS (SELECT r.r,
        |     ${hex60("'cms:' || CAST(r.r AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)")}
        |       % 256 AS bucket
        |   FROM events e CROSS JOIN rs r),
        | sk AS (SELECT r, bucket, COUNT(*) AS cnt FROM cells GROUP BY r, bucket),
        | est AS (SELECT MIN(s) AS cms_join_size
        |   FROM (SELECT r, SUM(cnt * cnt) AS s FROM sk GROUP BY r) t),
        | ex AS (SELECT SUM(cnt * cnt) AS exact_pairs
        |   FROM (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1) u)
        |SELECT CAST(e.cms_join_size AS BIGINT) AS cms_join_size,
        |  CAST(x.exact_pairs AS BIGINT) AS exact_pairs,
        |  CAST(e.cms_join_size - x.exact_pairs AS BIGINT) AS overcount
        |FROM est e CROSS JOIN ex x""".stripMargin,
    "q101_histogram" ->
      """WITH s AS (SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS mn,
        |            CAST(MAX(o_totalprice) AS DOUBLE) AS mx FROM orders),
        | b AS (SELECT CASE WHEN mx = mn THEN 0
        |              ELSE LEAST(FLOOR((CAST(o_totalprice AS DOUBLE) - mn) /
        |                         ((mx - mn) / 20.0)), 19) END AS bin,
        |         mn, (mx - mn) / 20.0 AS w
        |       FROM orders, s)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |  first(mn + bin * w) AS bin_lo,
        |  first(mn + (bin + 1) * w) AS bin_hi,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "q71_column_profile" -> ProfileCols.map(c =>
      s"""SELECT '$c' AS "column", COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_str,
         |  CAST(MAX($c) AS VARCHAR) AS max_str
         |FROM documents""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\""),
    "q72_dq_checks" ->
      """SELECT 'li_negative_price' AS check_name,
        |  CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        |FROM lineitem
        |UNION ALL
        |SELECT 'li_bad_discount',
        |  CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'li_null_quantity',
        |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'ord_null_orderdate',
        |  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'ord_nonpositive_total',
        |  CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'li_orphan_orderkey', COUNT(*)
        |FROM lineitem l WHERE NOT EXISTS
        |  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'cust_dup_key', COUNT(*)
        |FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1)
        |ORDER BY check_name""".stripMargin,
    "q73_length_trim" ->
      """WITH caps AS (
        |  SELECT source, round(quantile_cont(n_chars, 0.99), 6) AS cap
        |  FROM documents GROUP BY source)
        |SELECT d.source, ANY_VALUE(c.cap) AS cap,
        |  COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN d.n_chars <= c.cap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN d.n_chars > c.cap THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |FROM documents d JOIN caps c USING (source)
        |GROUP BY d.source
        |ORDER BY d.source""".stripMargin,
    "q106_kmv_distinct" ->
      s"""WITH hx AS (
        |  SELECT o_orderpriority AS grp, o_custkey,
        |    ${hex60("'kmv:' || CAST(o_custkey AS VARCHAR)")} AS hv
        |  FROM orders),
        | d AS (SELECT DISTINCT grp, hv FROM hx),
        | r AS (SELECT grp, hv,
        |         row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn FROM d),
        | a AS (SELECT grp, COUNT(*) AS nd,
        |         MAX(CASE WHEN rn = 256 THEN hv END) AS hk
        |       FROM r GROUP BY grp),
        | x AS (SELECT grp, COUNT(DISTINCT o_custkey) AS exact_distinct
        |       FROM hx GROUP BY grp)
        |SELECT a.grp AS o_orderpriority,
        |  CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
        |  CAST(LEAST(a.nd, 256) AS BIGINT) AS sketch_size,
        |  CAST(CASE WHEN a.hk IS NULL THEN LEAST(a.nd, 256)
        |       ELSE (CAST(255 AS HUGEINT) * CAST(${Sketch.HashSpace} AS HUGEINT))
        |            // CAST(a.hk AS HUGEINT) END AS BIGINT) AS kmv_estimate
        |FROM a JOIN x USING (grp)
        |ORDER BY o_orderpriority""".stripMargin,
    /* Rollup oracle: the q106 per-group chain plus a global level computed
     * directly over ALL distinct hashes — the merged-sketch row must equal
     * it exactly (lossless-merge property). */
    "q108_kmv_rollup" ->
      s"""WITH hx AS (
        |  SELECT o_orderpriority AS grp, o_custkey,
        |    ${hex60("'kmv:' || CAST(o_custkey AS VARCHAR)")} AS hv
        |  FROM orders),
        | d AS (SELECT DISTINCT grp, hv FROM hx),
        | r AS (SELECT grp, hv,
        |         row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn FROM d),
        | a AS (SELECT grp, COUNT(*) AS nd,
        |         MAX(CASE WHEN rn = 256 THEN hv END) AS hk
        |       FROM r GROUP BY grp),
        | x AS (SELECT grp, COUNT(DISTINCT o_custkey) AS exact_distinct
        |       FROM hx GROUP BY grp),
        | dg AS (SELECT DISTINCT hv FROM hx),
        | rg AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM dg),
        | ag AS (SELECT COUNT(*) AS nd,
        |          MAX(CASE WHEN rn = 256 THEN hv END) AS hk FROM rg),
        | xg AS (SELECT COUNT(DISTINCT o_custkey) AS exact_distinct FROM orders),
        | lv AS (SELECT a.grp AS scope, x.exact_distinct, a.nd, a.hk
        |        FROM a JOIN x USING (grp)
        |        UNION ALL
        |        SELECT '${Sketch.AllGroups}', xg.exact_distinct, ag.nd, ag.hk
        |        FROM ag, xg)
        |SELECT scope, CAST(exact_distinct AS BIGINT) AS exact_distinct,
        |  CAST(LEAST(nd, 256) AS BIGINT) AS sketch_size,
        |  CAST(CASE WHEN hk IS NULL THEN LEAST(nd, 256)
        |       ELSE (CAST(255 AS HUGEINT) * CAST(${Sketch.HashSpace} AS HUGEINT))
        |            // CAST(hk AS HUGEINT) END AS BIGINT) AS kmv_estimate
        |FROM lv
        |ORDER BY scope""".stripMargin,
    /* CMS oracle: the engine side builds per-day sketches and merges them;
     * because cell counts are additive, merged ≡ built-directly-global, so
     * the oracle computes the global (r, bucket) grid in one grouping. */
    "q110_cms_freq" ->
      s"""WITH rs AS (SELECT r FROM (VALUES (0),(1),(2),(3)) t(r)),
        | cells AS (SELECT r.r,
        |     ${hex60("'cms:' || CAST(r.r AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)")}
        |       % 256 AS bucket
        |   FROM events e CROSS JOIN rs r),
        | sk AS (SELECT r, bucket, COUNT(*) AS cnt FROM cells GROUP BY r, bucket),
        | probes AS (SELECT user_id, COUNT(*) AS exact_cnt FROM events
        |            GROUP BY user_id
        |            ORDER BY exact_cnt DESC, user_id ASC LIMIT 10),
        | pc AS (SELECT p.user_id, p.exact_cnt, r.r,
        |     ${hex60("'cms:' || CAST(r.r AS VARCHAR) || ':' || CAST(p.user_id AS VARCHAR)")}
        |       % 256 AS bucket
        |   FROM probes p CROSS JOIN rs r)
        |SELECT CAST(pc.user_id AS BIGINT) AS user_id,
        |  CAST(pc.exact_cnt AS BIGINT) AS exact_cnt,
        |  CAST(MIN(sk.cnt) AS BIGINT) AS cms_estimate,
        |  CAST(MIN(sk.cnt) - pc.exact_cnt AS BIGINT) AS overcount
        |FROM pc JOIN sk USING (r, bucket)
        |GROUP BY pc.user_id, pc.exact_cnt
        |ORDER BY user_id""".stripMargin,
    /* Quantile-sketch oracle: per-group bottom-k sample via one row_number
     * window over the qsk row hash, positional (lower) quantiles at integer
     * rank (sz-1)*bp//100, exact side via quantile_cont (≡ Spark percentile
     * at round 6 — the q73-proven pairing). The global level samples
     * DIRECTLY over all rows — equal to the engine's merged sketch by the
     * lossless bottom-k merge law. */
    "q113_quantile_sketch" ->
      s"""WITH hx AS (
        |  SELECT source AS grp, CAST(n_chars AS BIGINT) AS v,
        |    ${hex60("'qsk:' || CAST(doc_id AS VARCHAR)")} AS hv
        |  FROM documents),
        | r AS (SELECT grp, v,
        |         row_number() OVER (PARTITION BY grp ORDER BY hv, v) AS rn
        |       FROM hx),
        | sk AS (SELECT grp, v FROM r WHERE rn <= 256),
        | sr AS (SELECT grp, v,
        |          row_number() OVER (PARTITION BY grp ORDER BY v) AS vr,
        |          COUNT(*) OVER (PARTITION BY grp) AS sz FROM sk),
        | est AS (SELECT grp, MAX(sz) AS sketch_size,
        |     MAX(CASE WHEN vr = ((sz - 1) * 50) // 100 + 1 THEN v END) AS est_p50,
        |     MAX(CASE WHEN vr = ((sz - 1) * 90) // 100 + 1 THEN v END) AS est_p90
        |   FROM sr GROUP BY grp),
        | rg AS (SELECT v, row_number() OVER (ORDER BY hv, v) AS rn FROM hx),
        | skg AS (SELECT v FROM rg WHERE rn <= 256),
        | srg AS (SELECT v, row_number() OVER (ORDER BY v) AS vr,
        |           COUNT(*) OVER () AS sz FROM skg),
        | estg AS (SELECT MAX(sz) AS sketch_size,
        |     MAX(CASE WHEN vr = ((sz - 1) * 50) // 100 + 1 THEN v END) AS est_p50,
        |     MAX(CASE WHEN vr = ((sz - 1) * 90) // 100 + 1 THEN v END) AS est_p90
        |   FROM srg),
        | ex AS (SELECT grp, round(quantile_cont(v, 0.5), 6) AS exact_p50,
        |          round(quantile_cont(v, 0.9), 6) AS exact_p90
        |        FROM hx GROUP BY grp),
        | exg AS (SELECT round(quantile_cont(v, 0.5), 6) AS exact_p50,
        |           round(quantile_cont(v, 0.9), 6) AS exact_p90 FROM hx),
        | lv AS (
        |  SELECT e.grp AS scope, e.sketch_size,
        |    e.est_p50, x.exact_p50, e.est_p90, x.exact_p90
        |  FROM est e JOIN ex x USING (grp)
        |  UNION ALL
        |  SELECT '${Sketch.AllGroups}', g.sketch_size,
        |    g.est_p50, xg.exact_p50, g.est_p90, xg.exact_p90
        |  FROM estg g, exg xg)
        |SELECT scope, CAST(sketch_size AS BIGINT) AS sketch_size,
        |  CAST(est_p50 AS BIGINT) AS est_p50, exact_p50,
        |  CAST(est_p90 AS BIGINT) AS est_p90, exact_p90
        |FROM lv ORDER BY scope""".stripMargin,
    /* KMV-overlap oracle: per-day bottom-64 sketches (row_number over the
     * kmv hash), per-pair union sketch = bottom-64 of the two sketches'
     * union, shared = union-sample members present in BOTH sketches;
     * estimators in HUGEINT ≡ Spark DECIMAL(38,0) div. The exact side is
     * the distinct self-join the sketch path replaces. */
    /* q126: same sketch-replay machinery as q114 (bottom-64 per group,
     * coordinated union sample) on priority pairs; difference and
     * containment estimators in HUGEINT ≡ Spark DECIMAL(38,0) div. */
    "q126_sketch_diff" ->
      s"""WITH hx AS (SELECT DISTINCT o_orderpriority AS prio,
        |          ${hex60("'kmv:' || CAST(o_custkey AS VARCHAR)")} AS hv
        |        FROM orders),
        | r AS (SELECT prio, hv,
        |         row_number() OVER (PARTITION BY prio ORDER BY hv) AS rn FROM hx),
        | sk AS (SELECT prio, hv FROM r WHERE rn <= 64),
        | ps AS (SELECT DISTINCT o_orderpriority AS prio FROM orders),
        | prs AS (SELECT a.prio AS prio_a, b.prio AS prio_b
        |         FROM ps a JOIN ps b ON a.prio < b.prio),
        | pu AS (SELECT p.prio_a, p.prio_b, s.hv
        |        FROM prs p JOIN sk s ON s.prio = p.prio_a
        |        UNION
        |        SELECT p.prio_a, p.prio_b, s.hv
        |        FROM prs p JOIN sk s ON s.prio = p.prio_b),
        | m AS (SELECT prio_a, prio_b, hv,
        |         row_number() OVER (PARTITION BY prio_a, prio_b ORDER BY hv) AS rn
        |       FROM pu),
        | mk AS (SELECT prio_a, prio_b, hv FROM m WHERE rn <= 64),
        | sh AS (SELECT mk.prio_a, mk.prio_b, mk.hv,
        |          CASE WHEN sa.hv IS NOT NULL THEN 1 ELSE 0 END AS ina,
        |          CASE WHEN sb.hv IS NOT NULL THEN 1 ELSE 0 END AS inb
        |        FROM mk LEFT JOIN sk sa ON sa.prio = mk.prio_a AND sa.hv = mk.hv
        |                LEFT JOIN sk sb ON sb.prio = mk.prio_b AND sb.hv = mk.hv),
        | ag AS (SELECT prio_a, prio_b, COUNT(*) AS km, MAX(hv) AS hk,
        |          SUM(ina) AS ak, SUM(inb) AS bk, SUM(ina * inb) AS shared
        |        FROM sh GROUP BY prio_a, prio_b),
        | eu AS (SELECT *, CASE WHEN km < 64 THEN km
        |          ELSE (CAST(63 AS HUGEINT) * CAST(${Sketch.HashSpace} AS HUGEINT))
        |               // CAST(hk AS HUGEINT) END AS est_union
        |        FROM ag),
        | du AS (SELECT DISTINCT o_orderpriority AS prio, o_custkey FROM orders),
        | np AS (SELECT prio, COUNT(*) AS n FROM du GROUP BY prio),
        | xi AS (SELECT a.prio AS prio_a, b.prio AS prio_b, COUNT(*) AS inter
        |        FROM du a JOIN du b
        |          ON b.o_custkey = a.o_custkey AND a.prio < b.prio
        |        GROUP BY 1, 2)
        |SELECT e.prio_a, e.prio_b,
        |  CAST(e.ak AS BIGINT) AS a_k, CAST(e.bk AS BIGINT) AS b_k,
        |  CAST(e.shared AS BIGINT) AS shared_k,
        |  CAST((CAST(e.ak - e.shared AS HUGEINT) * CAST(e.est_union AS HUGEINT))
        |       // CAST(e.km AS HUGEINT) AS BIGINT) AS est_only_a,
        |  CAST((CAST(e.bk - e.shared AS HUGEINT) * CAST(e.est_union AS HUGEINT))
        |       // CAST(e.km AS HUGEINT) AS BIGINT) AS est_only_b,
        |  CAST((10000 * e.shared) // e.ak AS BIGINT) AS cont_a_in_b_bp,
        |  CAST((10000 * e.shared) // e.bk AS BIGINT) AS cont_b_in_a_bp,
        |  CAST(na.n - COALESCE(x.inter, 0) AS BIGINT) AS exact_only_a,
        |  CAST(nb.n - COALESCE(x.inter, 0) AS BIGINT) AS exact_only_b,
        |  CAST((10000 * COALESCE(x.inter, 0)) // na.n AS BIGINT) AS exact_cont_a_bp,
        |  CAST((10000 * COALESCE(x.inter, 0)) // nb.n AS BIGINT) AS exact_cont_b_bp
        |FROM eu e LEFT JOIN xi x USING (prio_a, prio_b)
        |  JOIN np na ON na.prio = e.prio_a JOIN np nb ON nb.prio = e.prio_b
        |ORDER BY prio_a, prio_b""".stripMargin,
    "q114_sketch_overlap" ->
      s"""WITH ev AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, user_id
        |            FROM events),
        | du AS (SELECT DISTINCT day, user_id FROM ev),
        | hx AS (SELECT DISTINCT day,
        |          ${hex60("'kmv:' || CAST(user_id AS VARCHAR)")} AS hv
        |        FROM ev),
        | r AS (SELECT day, hv,
        |         row_number() OVER (PARTITION BY day ORDER BY hv) AS rn FROM hx),
        | sk AS (SELECT day, hv FROM r WHERE rn <= 64),
        | days AS (SELECT DISTINCT day FROM ev),
        | prs AS (SELECT a.day AS day_a, b.day AS day_b
        |         FROM days a JOIN days b
        |           ON CAST(CAST(a.day AS DATE) + 1 AS VARCHAR) = b.day),
        | pu AS (SELECT p.day_a, p.day_b, s.hv
        |        FROM prs p JOIN sk s ON s.day = p.day_a
        |        UNION
        |        SELECT p.day_a, p.day_b, s.hv
        |        FROM prs p JOIN sk s ON s.day = p.day_b),
        | m AS (SELECT day_a, day_b, hv,
        |         row_number() OVER (PARTITION BY day_a, day_b ORDER BY hv) AS rn
        |       FROM pu),
        | mk AS (SELECT day_a, day_b, hv FROM m WHERE rn <= 64),
        | sh AS (SELECT mk.day_a, mk.day_b, mk.hv,
        |          CASE WHEN sa.hv IS NOT NULL AND sb.hv IS NOT NULL
        |               THEN 1 ELSE 0 END AS inboth
        |        FROM mk LEFT JOIN sk sa ON sa.day = mk.day_a AND sa.hv = mk.hv
        |                LEFT JOIN sk sb ON sb.day = mk.day_b AND sb.hv = mk.hv),
        | ag AS (SELECT day_a, day_b, COUNT(*) AS km, MAX(hv) AS hk,
        |          SUM(inboth) AS shared
        |        FROM sh GROUP BY day_a, day_b),
        | eu AS (SELECT day_a, day_b, km, shared,
        |          CASE WHEN km < 64 THEN km
        |               ELSE (CAST(63 AS HUGEINT) * CAST(${Sketch.HashSpace} AS HUGEINT))
        |                    // CAST(hk AS HUGEINT) END AS est_union
        |        FROM ag),
        | nd AS (SELECT day, COUNT(*) AS n FROM du GROUP BY day),
        | xi AS (SELECT p.day_a, p.day_b, COUNT(*) AS exact_intersection
        |        FROM prs p JOIN du a ON a.day = p.day_a
        |                   JOIN du b ON b.day = p.day_b AND b.user_id = a.user_id
        |        GROUP BY p.day_a, p.day_b)
        |-- LEFT join + COALESCE 0: zero-overlap day pairs must appear
        |SELECT e.day_a, e.day_b,
        |  CAST(e.km AS BIGINT) AS union_k, CAST(e.shared AS BIGINT) AS shared_k,
        |  CAST(e.est_union AS BIGINT) AS est_union,
        |  CAST((CAST(e.shared AS HUGEINT) * CAST(e.est_union AS HUGEINT))
        |       // CAST(e.km AS HUGEINT) AS BIGINT) AS est_intersection,
        |  CAST((10000 * e.shared) // e.km AS BIGINT) AS est_jaccard_bp,
        |  CAST(na.n + nb.n - COALESCE(x.exact_intersection, 0) AS BIGINT) AS exact_union,
        |  CAST(COALESCE(x.exact_intersection, 0) AS BIGINT) AS exact_intersection
        |FROM eu e LEFT JOIN xi x USING (day_a, day_b)
        |  JOIN nd na ON na.day = e.day_a JOIN nd nb ON nb.day = e.day_b
        |ORDER BY day_a""".stripMargin)
}
