package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 maintenance — the version-history
  * counterpart of the reference's Type-1 upserts (`update_dims.sql:100-135`
  * overwrites vehicle rows in place; SCD2 instead closes the old version and
  * appends the new one, preserving history).
  *
  * State schema: (key, attrs…, valid_from, valid_to, is_current) — batch
  * sequence numbers as the validity clock (deterministic and replayable;
  * wall-clock stamps are a presentation concern layered on top).
  *
  * Scale shape per merge: ONE equi-join of the updates batch against the
  * CURRENT slice of the dimension on the business key (AQE broadcasts the
  * updates side when the batch is small — the common case; a full-snapshot
  * batch degrades gracefully to a shuffle join), plus one join of the state
  * against the changed-key set to close superseded rows. No window, no
  * global sort, no collect; history rows (is_current = false) are never
  * rewritten — at warehouse scale pair that with partitioning on
  * `is_current` so closes touch only the current partition.
  */
object Scd {

  /** Bootstrap an SCD2 state from the first batch: every row becomes an
    * open version. */
  def scd2Init(batch: DataFrame, keyCol: String, attrCols: Seq[String],
               batchId: Long): DataFrame =
    batch.select(
      (col(keyCol) +: attrCols.map(col)) ++ Seq(
        lit(batchId).as("valid_from"),
        lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current")): _*)

  /** One SCD2 merge step: apply `updates` (a DELTA batch — absent keys are
    * untouched) to `state` as of `batchId`.
    *
    *   - new key                   → insert open version
    *   - known key, attrs equal    → no-op (idempotent re-delivery is safe)
    *   - known key, attrs changed  → close current row (valid_to = batchId),
    *                                 insert new open version
    *
    * Attribute comparison is null-safe (`<=>`): NULL → value and
    * value → NULL both count as changes, NULL → NULL does not. */
  def scd2Merge(state: DataFrame, updates: DataFrame, keyCol: String,
                attrCols: Seq[String], batchId: Long): DataFrame = {
    val cur = state.filter(col("is_current")).as("c")
    val u = updates.as("u")
    // one (updates ⋈ current) join feeds both outputs: rows to INSERT
    // (no current version, or attrs differ) and the keys to CLOSE
    val changed = attrCols
      .map(a => !(col(s"u.$a") <=> col(s"c.$a")))
      .reduce(_ || _)
    val joined = u.join(cur, col(s"u.$keyCol") === col(s"c.$keyCol"), "left")
      .filter(col(s"c.$keyCol").isNull || changed)
    val inserts = joined.select(
      (col(s"u.$keyCol").as(keyCol) +: attrCols.map(a => col(s"u.$a").as(a))) ++ Seq(
        lit(batchId).as("valid_from"),
        lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current")): _*)
    val closeKeys = joined.filter(col(s"c.$keyCol").isNotNull)
      .select(col(s"u.$keyCol").as("_close_key")).distinct()
    val closed = state.join(closeKeys,
        col(keyCol) === col("_close_key") && col("is_current"), "left")
      .select(
        (col(keyCol) +: attrCols.map(col)) ++ Seq(
          col("valid_from"),
          when(col("_close_key").isNotNull, lit(batchId))
            .otherwise(col("valid_to")).as("valid_to"),
          when(col("_close_key").isNotNull, lit(false))
            .otherwise(col("is_current")).as("is_current")): _*)
    closed.unionByName(inserts)
  }

  /** Snapshot diff — the change-data-feed operator (Delta CDF / Iceberg
    * changelog shape): compare two versions of a keyed table and emit one
    * row per difference, tagged `insert` / `update` / `delete`. Unchanged
    * rows are NOT emitted (the diff is the delta, not the table). `update`
    * and `insert` rows carry the NEW attribute values, `delete` rows the
    * old ones. Attribute comparison is null-safe.
    *
    * Scale shape: ONE full-outer equi-join on the key — both sides shuffle
    * once; at warehouse scale this is the minimal movement any diff needs
    * (AQE broadcasts when a side is small). */
  /** Point-in-time (temporal) lookup against an SCD2 history: resolve each
    * probe row's key to the dimension version valid at the probe's clock
    * `timeCol` — `valid_from <= t < valid_to` (open `valid_to` = current).
    * Probes before a key's first version (or for unknown keys) drop out.
    *
    * Scale shape: ONE equi-join on the key + a validity post-filter —
    * versions per key are bounded (append-only history, few versions), so
    * the filter discards O(versions) rows per probe. Deliberately NOT a
    * range join: an inequality-only join would plan BNLJ at fact scale. */
  def pointInTime(probes: DataFrame, history: DataFrame, keyCol: String,
                  timeCol: String): DataFrame =
    probes.join(history, Seq(keyCol))
      .filter(col("valid_from") <= col(timeCol) &&
        (col("valid_to").isNull || col(timeCol) < col("valid_to")))

  /** Apply a [[snapshotDiff]]-shaped change feed to a snapshot: inserts and
    * updates take the feed's attribute values, deletes drop the key — the
    * consumer half of the CDC loop (`applyDiff(v1, snapshotDiff(v1, v2)) ≡
    * v2`, pinned in WarehouseOpsSpec).
    *
    * Scale shape: one left anti/semi-free full pass — the snapshot joins
    * the (usually much smaller, AQE-broadcastable) diff once on the key;
    * untouched rows stream through the join unmodified. */
  def applyDiff(snapshot: DataFrame, diff: DataFrame, keyCol: String,
                attrCols: Seq[String]): DataFrame = {
    val d = diff.select(col(keyCol) +: col("change_type") +:
      attrCols.map(a => col(a).as(s"_d_$a")): _*)
    val merged = snapshot.join(d, Seq(keyCol), "full_outer")
      .filter(coalesce(col("change_type"), lit("")) =!= "delete")
      .select(col(keyCol) +: attrCols.map(a =>
        when(col("change_type").isin("insert", "update"), col(s"_d_$a"))
          .otherwise(col(a)).as(a)): _*)
    merged
  }

  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                   attrCols: Seq[String]): DataFrame = {
    val o = oldDf.as("o")
    val n = newDf.as("n")
    val changed = attrCols
      .map(a => !(col(s"o.$a") <=> col(s"n.$a")))
      .reduce(_ || _)
    o.join(n, col(s"o.$keyCol") === col(s"n.$keyCol"), "full_outer")
      .withColumn("change_type",
        when(col(s"o.$keyCol").isNull, lit("insert"))
          .when(col(s"n.$keyCol").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(
        col("change_type") +:
          coalesce(col(s"n.$keyCol"), col(s"o.$keyCol")).as(keyCol) +:
          attrCols.map(a =>
            when(col("change_type") === "delete", col(s"o.$a"))
              .otherwise(col(s"n.$a")).as(a)): _*)
  }
}
