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

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_funnel" -> (q82Funnel _),
    "q83_retention" -> (q83Retention _),
    "q87_top_paths" -> (q87TopPaths _),
    "q94_transition_matrix" -> (q94TransitionMatrix _)
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
        |SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
        |UNION ALL SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
        |UNION ALL SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
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
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin
  )
}
