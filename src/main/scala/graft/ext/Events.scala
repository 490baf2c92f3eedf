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
    // stage labels zero-pad the index so lexicographic order IS funnel
    // order past 9 stages ("10_x" would sort before "2_y" unpadded)
    reached.zip(stages).zipWithIndex
      .map { case ((df, stage), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(f"${i + 1}%02d_$stage").as("stage"), col("n_users"))
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

  /** Peak interval concurrency (sweep line): how many intervals of each
    * `typeCol` overlap at the busiest instant of each day. Each row opens an
    * interval [ts, ts + durSecs) (clamped to its calendar day, so the sweep
    * is complete within every (type, day) partition); the sweep explodes
    * ±1 boundary events and takes the max running sum. End events sort
    * BEFORE start events at the same instant (delta ascending), so an
    * interval ending exactly when another starts does NOT count as
    * concurrent — the half-open convention.
    *
    * Scale shape: one map-side explode (2 rows per input), one
    * (type, day)-keyed window shuffle, one map-side-combinable max per
    * group. Output is |types| × |days| rows — calendar-bounded. All
    * arithmetic integer; the only per-row state is the running sum. */
  def peakConcurrency(events: DataFrame, typeCol: String, tsCol: String,
                      idCol: String, durSecs: Column, epoch: String): DataFrame = {
    val dayEnd = date_add(col("_ts").cast("date"), 1).cast("timestamp_ntz")
    val endTs = least(expr("timestampadd(SECOND, _dur, _ts)"), dayEnd)
    val bounds = events
      // normalize to NTZ so the day-end clamp type-checks for TIMESTAMP
      // inputs too (identity for the NTZ tables; UTC session elsewhere)
      .withColumn("_ts", col(tsCol).cast("timestamp_ntz"))
      .withColumn("_dur", durSecs)
      .select(col(typeCol).as("event_type"),
        col("_ts").cast("date").as("_dayd"), col(idCol).as("_id"),
        explode(array(
          struct(col("_ts").as("t"), lit(1).as("delta")),
          struct(endTs.as("t"), lit(-1).as("delta")))).as("_b"))
      .select(col("event_type"), col("_dayd"), col("_id"),
        col("_b.t").as("t"), col("_b.delta").as("delta"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("_dayd"))
      .orderBy(col("t").asc, col("delta").asc, col("_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    bounds.withColumn("_run", sum(col("delta")).over(w))
      .groupBy(col("event_type"), col("_dayd"))
      .agg(max(col("_run")).cast("long").as("peak_concurrency"))
      .select(col("event_type"),
        datediff(col("_dayd"), lit(epoch).cast("date")).cast("long").as("day"),
        col("peak_concurrency"))
  }

  /** Gaps-and-islands activity streaks: per user, group CONSECUTIVE active
    * days into islands (the classic `day − row_number()` trick — constant
    * within a run of consecutive days, jumps at every gap) and report the
    * longest streak, streak count, and total active days.
    *
    * Scale shape: one distinct over (user, day) — map-side combinable —
    * one user-keyed window for row_number, two map-side-combinable
    * aggregations. Output is one row per user. */
  def activityStreaks(events: DataFrame, userCol: String, tsCol: String,
                      epoch: String): DataFrame = {
    val day = datediff(col(tsCol).cast("date"), lit(epoch).cast("date"))
      .cast("long").as("_day")
    val activity = events.select(col(userCol), day).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("_day"))
    activity
      .withColumn("_island", col("_day") - row_number().over(w))
      .groupBy(col(userCol), col("_island"))
      .agg(count(lit(1)).as("_len"))
      .groupBy(col(userCol))
      .agg(max(col("_len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("_len")).as("n_active_days"))
  }

  /** Last-touch attribution: each `target` event is attributed to the LAST
    * preceding non-target event type of the same user (time order, ties by
    * `idCol`); targets with no preceding touch attribute to "(none)".
    * Returns per attributed type: conversion count and exact-cents revenue
    * (`valueCol` cast to DECIMAL(18,2) BEFORE summing — double summation
    * order is engine-dependent, decimal is exact).
    *
    * Scale shape: one user-keyed window shuffle (`last` with ignoreNulls
    * over the preceding frame is O(1) state per row), one
    * map-side-combinable aggregation over |types| groups. */
  def lastTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
                           idCol: String, typeCol: String, valueCol: String,
                           target: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    events
      .withColumn("_touch",
        last(when(col(typeCol) =!= target, col(typeCol)), ignoreNulls = true).over(w))
      .filter(col(typeCol) === target)
      .groupBy(coalesce(col("_touch"), lit("(none)")).as("attributed_type"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col(valueCol).cast("decimal(18,2)")).as("revenue"))
  }

  /** Event-type co-occurrence with lift: how often two event types occur in
    * the same (user, day) basket vs what independence predicts.
    * `lift = P(a,b) / (P(a)·P(b)) = co·N / (nₐ·n_b)` — computed as ONE
    * double division of two exact BIGINT products, so it replays
    * bit-identically in any engine (no logs: PMI's `ln` is libm-dependent).
    *
    * Scale shape: one distinct over (user, day, type), one (user, day)-keyed
    * self equi-join (baskets are small — bounded by the type vocabulary),
    * per-type counts broadcast onto the vocabulary-sized pair table. */
  def cooccurrenceLift(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String): DataFrame = {
    val baskets = events
      .select(col(userCol).as("_u"), col(tsCol).cast("date").as("_d"),
        col(typeCol).as("_t"))
      .distinct()
    val n = baskets.select(col("_u"), col("_d")).distinct()
      .agg(count(lit(1)).as("_n"))
    val typeCounts = baskets.groupBy(col("_t")).agg(count(lit(1)).as("_nt"))
    val co = baskets.as("a").join(baskets.as("b"),
        col("a._u") === col("b._u") && col("a._d") === col("b._d") &&
          col("a._t") < col("b._t"))
      .groupBy(col("a._t").as("type_a"), col("b._t").as("type_b"))
      .agg(count(lit(1)).as("n_co"))
    co.join(broadcast(typeCounts.select(col("_t").as("type_a"), col("_nt").as("n_a"))), "type_a")
      .join(broadcast(typeCounts.select(col("_t").as("type_b"), col("_nt").as("n_b"))), "type_b")
      .crossJoin(broadcast(n))
      .select(col("type_a"), col("type_b"), col("n_co"), col("n_a"), col("n_b"),
        ((col("n_co") * col("_n")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
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
