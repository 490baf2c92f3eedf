package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-analytics operators over a (user, ts, event_type) stream: ordered
  * funnels and cohort retention — the product-analytics queries every event
  * warehouse serves.
  */
object Events {

  /** Ordered funnel: per stage k, the number of users whose first stage-k
    * event STRICTLY FOLLOWS their first qualifying stage-(k-1) event.
    * Returns one row per stage: (stage, n_users), stages labeled
    * "1_<type>", "2_<type>", … so lexicographic order is funnel order.
    *
    * Scale shape: stage 1 is one map-side-combinable (user, min ts) agg;
    * each later stage joins the (shrinking) qualified-user set back to that
    * stage's events on the user key — k-1 equi-joins for a k-stage funnel,
    * all keyed on user, each over a filtered slice of the event stream.
    * AQE broadcasts the qualified side once conversion thins it. Counts are
    * exact; nothing is collected (the per-stage counts union via a
    * DataFrame agg per stage — k tiny single-row frames). */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // reached(k): users with first-ts of stage k after their reached(k-1) ts
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    val reached = stages.tail.scanLeft(first) { (prev, stage) =>
      events.filter(col(typeCol) === stage)
        .join(prev.select(col(userCol), col("_t").as("_prev_t")), userCol)
        .filter(col(tsCol) > col("_prev_t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    }
    reached.zip(stages).zipWithIndex
      .map { case ((df, stage), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(s"${i + 1}_$stage").as("stage"), col("n_users"))
      }
      .reduce(_ unionByName _)
  }

  /** Cohort retention matrix: cohort = each user's first active day (index
    * relative to `epoch`), offset = days after the cohort day a user is
    * active again; counts distinct users per (cohort_day, day_offset).
    * Day indexes (BIGINT) rather than dates keep the output
    * engine-portable.
    *
    * Scale shape: one (user → min day) aggregation, one distinct over
    * (user, day) — both map-side-combinable — and one join back on the
    * user key; the output is |days|² / 2 rows, bounded by the calendar,
    * never by users or events. */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
                       epoch: String): DataFrame = {
    val day = datediff(col(tsCol).cast("date"), lit(epoch).cast("date"))
      .cast("long").as("_day")
    val activity = events.select(col(userCol), day).distinct()
    val cohorts = activity.groupBy(col(userCol)).agg(min(col("_day")).as("_cohort"))
    activity.join(cohorts, userCol)
      .groupBy(col("_cohort").as("cohort_day"),
        (col("_day") - col("_cohort")).as("day_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}
