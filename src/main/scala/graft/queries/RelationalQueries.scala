package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Output.tinySort
import graft.util.Tables.load

/** Relational operator coverage (SURVEY.md §2.3-§2.5, §2.7, §2.10) mapped onto
  * the driver testdata per SURVEY.md §7.3.
  *
  * Hash-stability rules shared with the DuckDB oracles:
  *   - money aggregates go through DECIMAL(18,2) so partial-aggregation order
  *     cannot perturb the result (exact arithmetic in both engines);
  *   - every query ends in a deterministic total ORDER BY;
  *   - ascending ORDER BY columns that can be null carry NULLS FIRST in the
  *     oracle (Spark's asc default) — DuckDB's default is NULLS LAST.
  *
  * Scale notes (100 TB design): only true (fixed-cardinality) dimension sides
  * are wrapped in `broadcast(...)`; fact-scale tables are never hinted — AQE
  * picks shuffled hash / sort-merge for those. The disjunctive join (J1
  * analog, q06) ships with the union-of-equi-joins rewrite used at scale
  * (see [[graft.star.Joins]]).
  */
object RelationalQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** TPC-H Q1-style pricing summary — grouped aggregation (SURVEY §2.5 note:
    * the star schema exists to serve GROUP BY dim queries; reference A5). */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum((dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("decimal(28,4)")).cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .transform(tinySort(_, col("l_returnflag"), col("l_linestatus")))
  }

  /** F1: regex-contains validity filter (`rlike`, null → filtered, matching
    * pandas `str.contains(na=False)` — reference T:110-132). */
  def q02RlikeFilter(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "part")
      .filter(lower(col("p_name")).rlike("widget|bolt"))
      .select(col("p_partkey"), col("p_name"), col("p_type"))
      .orderBy(col("p_partkey"))

  /** F2: complement extraction — the other branch of F1 (reference T:127). */
  def q03RlikeComplement(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "part")
      .filter(!lower(col("p_name")).rlike("widget|bolt"))
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))

  /** A4: keep-newest-per-key dedup as a window, NOT dropDuplicates — the only
    * order-correct mapping of pandas sort+drop_duplicates(keep='first')
    * (reference T:140+150); event_id desc is the determinism tie-break. */
  def q04KeepNewest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    load(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  /** J3/J4 analog: multi-way star left-join (lineitem⋈orders⋈customer⋈nation⋈
    * region) grouped to revenue per region/nation. Scale shape: only the true
    * dims (nation, region — fixed cardinality) are broadcast; orders and
    * customer grow linearly with the fact table, so those joins are left to
    * AQE (shuffled hash / sort-merge on the join key) — broadcasting a
    * fact-scale build side OOMs the driver at 100×. */
  def q05StarRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    val o = load(spark, dir, "orders")
    val c = load(spark, dir, "customer")
    val n = load(spark, dir, "nation")
    val r = load(spark, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"), "left")
      .join(c, col("o_custkey") === col("c_custkey"), "left")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum((dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("decimal(28,4)")).cast("double").as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .transform(tinySort(_, col("r_name"), col("n_name")))
  }

  /** J1: disjunctive (OR-condition) left join — BroadcastNestedLoopJoin is fine
    * at dim cardinality; [[graft.star.Joins.disjunctiveLeftRewrite]] is the
    * union-of-equi-joins form used at 100 TB scale (reference Q:82-83). */
  def q06DisjunctiveJoin(spark: SparkSession, dir: String): DataFrame = {
    val n = load(spark, dir, "nation")
    val r = load(spark, dir, "region")
    n.join(broadcast(r),
        col("n_regionkey") === col("r_regionkey") || col("n_name") === col("r_name"), "left")
      .select(col("n_nationkey"), col("n_name"), col("r_regionkey"), col("r_name"))
      .orderBy(col("n_nationkey"), col("r_regionkey"))
  }

  /** A1/E19: DISTINCT over a normalized key (`trim(lower(...))` — the dim-load
    * pattern, reference Q:8-12). */
  def q07DistinctNorm(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "customer")
      .filter(col("c_mktsegment").isNotNull)
      .select(trim(lower(col("c_mktsegment"))).as("segment"))
      .distinct()
      .orderBy(col("segment"))

  /** A2: DISTINCT over a pair (compound dim key, reference Q:79-86). */
  def q08DistinctPairs(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"))
      .distinct()
      .orderBy(col("c_nationkey"), col("c_mktsegment"))

  /** U1 as an anti-join: "insert only new keys" ≡ NOT EXISTS (reference
    * ON CONFLICT DO NOTHING, Q:12 et al). */
  def q09AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer")
    val o = load(spark, dir, "orders").filter(col("o_orderstatus") === "P")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Semi-join: customers with at least one finished order (EXISTS). */
  def q10SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer")
    val o = load(spark, dir, "orders").filter(col("o_orderstatus") === "F")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** O3: unionByName over possibly-divergent schemas (reference T:378). */
  def q11UnionByName(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer")
      .select(col("c_name").as("name"), lit("customer").as("src"))
    val s = load(spark, dir, "supplier")
      .select(lit("supplier").as("src"), col("s_name").as("name"))
    c.unionByName(s).orderBy(col("src"), col("name"))
  }

  /** U2: full-row upsert, incoming wins — union + window keep-first, the
    * no-Delta merge pattern (reference ON CONFLICT DO UPDATE, Q:158-177). */
  def q12UpsertIncomingWins(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
    val existing = ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("user_id"), col("value"), lit("existing").as("src"))
    val incoming = ev.filter(col("value") > 100.0)
      .select(col("event_id"), col("user_id"), col("value"), lit("incoming").as("src"))
    val w = Window.partitionBy(col("event_id")).orderBy(col("src").desc)
    incoming.unionByName(existing)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("value"), col("src"))
      .orderBy(col("event_id"))
  }

  /** O1: global sort desc (reference sort_values, T:140/T:385/L:96) with a
    * deterministic tie-break — a full range-partitioned Exchange + sort. */
  def q33SortDesc(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("value").desc_nulls_last, col("event_id"))

  /** q75 — set operations (§2.7): INTERSECT / EXCEPT of per-year customer
    * key sets. Spark plans both as hash aggregates + joins over the
    * distinct key sets (left-semi for intersect, left-anti for except) —
    * no sort-based distinct, shuffles keyed on the customer key. Output is
    * bounded by |customers| → [[tinySort]]. */
  def q75IntersectExcept(spark: SparkSession, dir: String): DataFrame = {
    val orders = load(spark, dir, "orders")
    def keysOf(y: Int) = orders.filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey")).distinct()
    val a = keysOf(1996)
    val b = keysOf(1997)
    a.intersect(b).withColumn("tag", lit("both"))
      .unionByName(a.except(b).withColumn("tag", lit("only_1996")))
      .select(col("tag"), col("o_custkey"))
      .transform(tinySort(_, col("tag"), col("o_custkey")))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_sort_desc" -> (q33SortDesc _),
    "q75_intersect_except" -> (q75IntersectExcept _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_rlike_filter" -> (q02RlikeFilter _),
    "q03_rlike_complement" -> (q03RlikeComplement _),
    "q04_keep_newest" -> (q04KeepNewest _),
    "q05_star_revenue" -> (q05StarRevenue _),
    "q06_disjunctive_join" -> (q06DisjunctiveJoin _),
    "q07_distinct_norm" -> (q07DistinctNorm _),
    "q08_distinct_pairs" -> (q08DistinctPairs _),
    "q09_anti_join" -> (q09AntiJoin _),
    "q10_semi_join" -> (q10SemiJoin _),
    "q11_union_byname" -> (q11UnionByName _),
    "q12_upsert_incoming_wins" -> (q12UpsertIncomingWins _)
  )

  val sql: Map[String, String] = Map(
    "q75_intersect_except" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
        | b AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
        |SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
        |UNION ALL
        |SELECT 'only_1996' AS tag, o_custkey FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
        |ORDER BY tag, o_custkey""".stripMargin,
    "q33_sort_desc" ->
      """SELECT event_id, user_id, value FROM events
        |ORDER BY value DESC NULLS LAST, event_id""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_rlike_filter" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE regexp_matches(lower(p_name), 'widget|bolt')
        |ORDER BY p_partkey""".stripMargin,
    "q03_rlike_complement" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT regexp_matches(lower(p_name), 'widget|bolt')
        |ORDER BY p_partkey""".stripMargin,
    "q04_keep_newest" ->
      """SELECT user_id, event_id, ts, event_type, value FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "q05_star_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |LEFT JOIN orders ON l_orderkey = o_orderkey
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q06_disjunctive_join" ->
      """SELECT n_nationkey, n_name, r_regionkey, r_name
        |FROM nation LEFT JOIN region
        |  ON n_regionkey = r_regionkey OR n_name = r_name
        |ORDER BY n_nationkey, r_regionkey NULLS FIRST""".stripMargin,
    "q07_distinct_norm" ->
      """SELECT DISTINCT trim(lower(c_mktsegment)) AS segment FROM customer
        |WHERE c_mktsegment IS NOT NULL
        |ORDER BY segment""".stripMargin,
    "q08_distinct_pairs" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        |ORDER BY c_nationkey NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
    "q09_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q10_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q11_union_byname" ->
      """SELECT name, src FROM (
        |  SELECT c_name AS name, 'customer' AS src FROM customer
        |  UNION ALL
        |  SELECT s_name AS name, 'supplier' AS src FROM supplier) u
        |ORDER BY src, name""".stripMargin,
    "q12_upsert_incoming_wins" ->
      """WITH u AS (
        |  SELECT event_id, user_id, value, 'incoming' AS src FROM events WHERE value > 100.0
        |  UNION ALL
        |  SELECT event_id, user_id, value, 'existing' AS src FROM events WHERE event_id % 2 = 0)
        |SELECT event_id, user_id, value, src FROM u
        |QUALIFY row_number() OVER (PARTITION BY event_id ORDER BY src DESC) = 1
        |ORDER BY event_id""".stripMargin
  )
}
