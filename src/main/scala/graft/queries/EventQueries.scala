package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Events
import graft.util.Output.tinySort
import graft.util.Tables.load

/** Product-analytics operators over the `events` stream: ordered funnels
  * and cohort retention ([[graft.ext.Events]]).
  */
object EventQueries {

  /** q82 — three-stage ordered funnel (view → click → purchase): users whose
    * first click strictly follows their first view, and first purchase
    * strictly follows that click. */
  def q82Funnel(spark: SparkSession, dir: String): DataFrame =
    Events.funnel(load(spark, dir, "events"), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .transform(tinySort(_, col("stage")))

  /** q83 — daily cohort retention matrix: users grouped by first active day
    * (index from 2024-01-01), distinct-user counts per (cohort, offset). */
  def q83Retention(spark: SparkSession, dir: String): DataFrame =
    Events.retentionCohorts(load(spark, dir, "events"), "user_id", "ts",
        epoch = "2024-01-01")
      .transform(tinySort(_, col("cohort_day"), col("day_offset")))

  /** q87 — top user paths ([[Events.topPaths]]): each user's first four
    * event types in time order, counted across users, top-10. */
  def q87TopPaths(spark: SparkSession, dir: String): DataFrame =
    Events.topPaths(load(spark, dir, "events"), "user_id", "ts", "event_id",
        "event_type", steps = 4, topN = 10)
      .transform(tinySort(_, col("rk")))

  /** q94 — Markov transition matrix ([[Events.transitionMatrix]]): per-user
    * next-event transitions, row-normalized. The |types|²-row output makes
    * the probability window vocabulary-sized. */
  def q94TransitionMatrix(spark: SparkSession, dir: String): DataFrame =
    Events.transitionMatrix(load(spark, dir, "events"), "user_id", "ts",
        "event_id", "event_type")
      .transform(tinySort(_, col("event_type"), col("next_type")))

  /** q98 — peak interval concurrency ([[Events.peakConcurrency]]): each
    * event opens an interval of `1 + floor(value)` seconds (clamped to its
    * calendar day); sweep-line max of concurrent intervals per
    * (event_type, day). End-before-start at equal instants (half-open). */
  def q98PeakConcurrency(spark: SparkSession, dir: String): DataFrame =
    Events.peakConcurrency(load(spark, dir, "events"), "event_type", "ts",
        "event_id", durSecs = lit(1L) + floor(col("value")).cast("long"),
        epoch = "2024-01-01")
      .transform(tinySort(_, col("event_type"), col("day")))

  /** q99 — gaps-and-islands activity streaks ([[Events.activityStreaks]]):
    * per user, longest run of consecutive active days, streak count, total
    * active days. */
  def q99Streaks(spark: SparkSession, dir: String): DataFrame =
    Events.activityStreaks(load(spark, dir, "events"), "user_id", "ts",
        epoch = "2024-01-01")
      .transform(tinySort(_, col("user_id")))

  /** q102 — event-type co-occurrence lift ([[Events.cooccurrenceLift]]):
    * (user, day) baskets, pair counts, lift as one double division of exact
    * integer products. */
  def q102CooccurrenceLift(spark: SparkSession, dir: String): DataFrame =
    Events.cooccurrenceLift(load(spark, dir, "events"), "user_id", "ts",
        "event_type")
      .transform(tinySort(_, col("type_a"), col("type_b")))

  /** q103 — last-touch attribution ([[Events.lastTouchAttribution]]): each
    * purchase attributed to the user's most recent non-purchase event;
    * exact-cents revenue per attributed type. */
  def q103Attribution(spark: SparkSession, dir: String): DataFrame =
    Events.lastTouchAttribution(load(spark, dir, "events"), "user_id", "ts",
        "event_id", "event_type", "value", target = "purchase")
      .transform(tinySort(_, col("attributed_type")))

  /** q105 — JSON property extraction: `props` is a JSON string column;
    * `from_json` with an explicit schema (the Spark-native path — schema'd
    * parse, not per-field string getters) feeds exact integer aggregates
    * per event type. Map-side parse, one map-side-combinable aggregation. */
  def q105JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val k = from_json(col("props"), org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))).getField("k")
    load(spark, dir, "events")
      .select(col("event_type"), k.as("_k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("_k")).as("sum_k"),
        min(col("_k")).as("min_k"),
        max(col("_k")).as("max_k"),
        countDistinct(col("_k")).as("n_distinct_k"))
      .transform(tinySort(_, col("event_type")))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_funnel" -> (q82Funnel _),
    "q83_retention" -> (q83Retention _),
    "q87_top_paths" -> (q87TopPaths _),
    "q94_transition_matrix" -> (q94TransitionMatrix _),
    "q98_peak_concurrency" -> (q98PeakConcurrency _),
    "q99_streaks" -> (q99Streaks _),
    "q102_cooccurrence_lift" -> (q102CooccurrenceLift _),
    "q103_attribution" -> (q103Attribution _),
    "q105_json_extract" -> (q105JsonExtract _)
  )

  val sql: Map[String, String] = Map(
    "q94_transition_matrix" ->
      """WITH o AS (SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST) AS next_type
        |  FROM events),
        | c AS (SELECT event_type, next_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_transitions
        |  FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, n_transitions,
        |  CAST(n_transitions AS DOUBLE) /
        |  CAST(CAST(SUM(n_transitions) OVER (PARTITION BY event_type) AS BIGINT) AS DOUBLE) AS prob
        |FROM c ORDER BY event_type, next_type""".stripMargin,
    "q82_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        | c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |       JOIN v ON e.user_id = v.user_id
        |       WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
        | p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |       JOIN c ON e.user_id = c.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
        |SELECT '01_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
        |UNION ALL SELECT '02_click', CAST(COUNT(*) AS BIGINT) FROM c
        |UNION ALL SELECT '03_purchase', CAST(COUNT(*) AS BIGINT) FROM p
        |ORDER BY stage""".stripMargin,
    "q87_top_paths" ->
      """WITH s AS (SELECT user_id,
        |            list(event_type ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST)[1:4] AS p
        |           FROM events GROUP BY user_id),
        | c AS (SELECT array_to_string(p, '>') AS path,
        |         CAST(COUNT(*) AS BIGINT) AS n_users
        |       FROM s GROUP BY 1),
        | r AS (SELECT path, n_users,
        |         CAST(row_number() OVER (ORDER BY n_users DESC, path ASC NULLS LAST) AS BIGINT) AS rk
        |       FROM c)
        |SELECT path, n_users, rk FROM r WHERE rk <= 10 ORDER BY rk""".stripMargin,
    "q83_retention" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
        |           FROM events),
        | co AS (SELECT user_id, MIN(day) AS cohort FROM d GROUP BY user_id)
        |SELECT co.cohort AS cohort_day, d.day - co.cohort AS day_offset,
        |  CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
        |FROM d JOIN co ON d.user_id = co.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    "q98_peak_concurrency" ->
      """WITH i AS (SELECT event_type, CAST(ts AS DATE) AS dayd, event_id, ts AS t0,
        |    least(ts + to_seconds(1 + CAST(FLOOR(value) AS BIGINT)),
        |          CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP)) AS t1
        |  FROM events),
        | d AS (SELECT event_type, dayd, event_id, t0 AS t, 1 AS delta FROM i
        |   UNION ALL SELECT event_type, dayd, event_id, t1, -1 FROM i),
        | r AS (SELECT event_type, dayd,
        |    SUM(delta) OVER (PARTITION BY event_type, dayd
        |      ORDER BY t ASC, delta ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM d)
        |SELECT event_type, CAST(dayd - DATE '2024-01-01' AS BIGINT) AS day,
        |  CAST(MAX(run) AS BIGINT) AS peak_concurrency
        |FROM r GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,
    "q99_streaks" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |            CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d
        |           FROM events),
        | i AS (SELECT user_id, d,
        |         d - row_number() OVER (PARTITION BY user_id ORDER BY d ASC) AS island
        |       FROM a),
        | s AS (SELECT user_id, island, COUNT(*) AS len FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak,
        |  CAST(COUNT(*) AS BIGINT) AS n_streaks,
        |  CAST(SUM(len) AS BIGINT) AS n_active_days
        |FROM s GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q102_cooccurrence_lift" ->
      """WITH bk AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d,
        |             event_type AS t FROM events),
        | n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn
        |       FROM (SELECT DISTINCT u, d FROM bk)),
        | tc AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS nt FROM bk GROUP BY 1),
        | co AS (SELECT a.t AS type_a, b.t AS type_b,
        |          CAST(COUNT(*) AS BIGINT) AS n_co
        |        FROM bk a JOIN bk b ON a.u = b.u AND a.d = b.d AND a.t < b.t
        |        GROUP BY 1, 2)
        |SELECT type_a, type_b, n_co, ta.nt AS n_a, tb.nt AS n_b,
        |  CAST(n_co * nn AS DOUBLE) / CAST(ta.nt * tb.nt AS DOUBLE) AS lift
        |FROM co JOIN tc ta ON ta.t = type_a JOIN tc tb ON tb.t = type_b, n
        |ORDER BY type_a, type_b""".stripMargin,
    "q103_attribution" ->
      """WITH a AS (SELECT event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |      IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT COALESCE(touch, '(none)') AS attributed_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_conversions,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS revenue
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY attributed_type""".stripMargin,
    "q105_json_extract" ->
      """WITH p AS (SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(MIN(k) AS BIGINT) AS min_k,
        |  CAST(MAX(k) AS BIGINT) AS max_k,
        |  CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
        |FROM p GROUP BY 1 ORDER BY event_type""".stripMargin
  )
}
