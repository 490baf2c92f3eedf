package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Calendar gap-fill (densification): aggregate a measure per day, then
    * left-join it onto the full day spine [min_day, max_day] so silent days
    * surface as explicit zero rows — the operator behind every "per day"
    * report that must not skip empty days. The spine GENERATES from the
    * observed min/max (a 1-row aggregate exploded via `sequence` — no
    * collect, no driver loop), and the join broadcasts it (a calendar is
    * O(days), never O(facts)). Day indexes are relative to `epoch`.
    *
    * Scale shape: one map-side-combinable daily aggregation (output is
    * calendar-bounded), one 1-row min/max agg, one broadcast join. */
  def gapFillDaily(df: DataFrame, tsCol: String, epoch: String,
                   aggs: Seq[(Column, String)]): DataFrame = {
    val day = datediff(col(tsCol).cast("date"), lit(epoch).cast("date"))
      .cast("long").as("day")
    val daily = df.select(day, col("*"))
      .groupBy(col("day"))
      .agg(aggs.head._1.as(aggs.head._2),
        aggs.tail.map { case (c, n) => c.as(n) }: _*)
    val spine = daily.agg(min(col("day")).as("_lo"), max(col("day")).as("_hi"))
      .select(explode(sequence(col("_lo"), col("_hi"))).as("day"))
    spine.join(daily, Seq("day"), "left")
  }

  /** Top user paths: each user's first `steps` event types in time order
    * (ties broken by `idCol`), joined with ">", counted across users, top
    * `topN` by frequency (count desc, path asc) — the path-mining query of
    * product analytics.
    *
    * Scale shape: one per-user aggregation whose state is the user's own
    * events (collect_list + sort_array — bounded by per-user activity, the
    * same contract as sessionization); one map-side-combinable path count;
    * one window over the DISTINCT-PATH table (vocabulary-sized, keyed by a
    * non-foldable constant — see tokenVocab). */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               idCol: String, typeCol: String, steps: Int, topN: Int): DataFrame = {
    val paths = events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col(tsCol), col(idCol), col(typeCol))))
        .as("_evs"))
      .select(concat_ws(">",
        transform(slice(col("_evs"), 1, steps), e => e.getField(typeCol)))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
    val one = substring(col("path"), 0, 0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(one)
      .orderBy(col("n_users").desc, col("path").asc)
    paths.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topN)
  }

  /** Markov transition matrix over per-user event streams: count
    * (event_type → next event_type) transitions in time order (ties broken
    * by `idCol`) and row-normalize into probabilities — the user-journey
    * model behind next-action prediction and funnel simulation.
    *
    * Scale shape: one user-keyed window shuffle for `lead`, one map-side-
    * combinable pair count; the probability window runs over the
    * TRANSITION-MATRIX table (|types|² rows, keyed by the source type).
    * The probability is a single double division of two exact counts —
    * deterministic in any engine. */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       idCol: String, typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val counts = events
      .select(col(typeCol).as("event_type"),
        lead(col(typeCol), 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val rowTotal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    counts.withColumn("prob",
      col("n_transitions").cast("double") /
        sum(col("n_transitions")).over(rowTotal).cast("double"))
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
