package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality / profiling operators — the governance pass over a corpus or
  * warehouse table: per-column profiles (the ANALYZE-style stats a planner
  * or a data catalog wants), declarative constraint checks (the
  * expectations gate before a load commits), and quantile-based outlier
  * trimming (the length-cap curation step).
  *
  * All exact (no sketches) so every number is oracle-checkable; the
  * approximate twins (HLL distinct, t-digest quantiles) become the drop-in
  * replacements only when a column's distinct count itself stops fitting —
  * at which point exactness is the thing being traded, not the operator
  * shape.
  */
object DataQuality {

  /** Per-column profile: one output row per profiled column with row/null/
    * distinct counts and min/max rendered as strings (binary UTF8 compare
    * in both Spark and the oracle engine — identical on ASCII data).
    *
    * Shape: ONE aggregation action. The multi-column distinct counts plan
    * through Spark's Expand (|cols| copies of the input into one shuffle) —
    * the standard profiling trade; output is |cols| rows from any input
    * size. At petabyte scale you run it per partition-batch, not per query.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_cnt_$c"),
        countDistinct(col(c)).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val total = count(lit(1)).as("_total")
    val one = df.agg(aggs.head, aggs.tail :+ total: _*)
    // single profile row → |cols| rows: map-side explode of a struct array
    val entries = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("_total").as("n_rows"),
        (col("_total") - col(s"_cnt_$c")).as("n_nulls"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_min_$c").as("min_str"),
        col(s"_max_$c").as("max_str"))
    }
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** The approximate twin of [[columnProfile]] — HyperLogLog++ distinct
    * counts (`approx_count_distinct`) instead of exact multi-distinct.
    * The exact form expands the input |cols|× through one shuffle; the HLL
    * form is a plain map-side-combinable aggregate carrying a fixed-size
    * sketch per column — the profile you run over the FULL 100 TB table
    * rather than a partition batch. Not oracle-comparable across engines
    * (sketch implementations differ); the spec bounds its relative error
    * against [[columnProfile]] instead. `rsd` is the target relative
    * standard deviation (default 0.023 ≈ Spark's). */
  def columnProfileApprox(df: DataFrame, cols: Seq[String],
                          rsd: Double = 0.023): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_cnt_$c"),
        approx_count_distinct(col(c), rsd).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val total = count(lit(1)).as("_total")
    val one = df.agg(aggs.head, aggs.tail :+ total: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("_total").as("n_rows"),
        (col("_total") - col(s"_cnt_$c")).as("n_nulls"),
        col(s"_nd_$c").as("n_distinct_approx"),
        col(s"_min_$c").as("min_str"),
        col(s"_max_$c").as("max_str"))
    }
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** Declarative constraint checks: each (name, violation-predicate-count)
    * pair becomes one output row. Checks over ONE table fuse into a single
    * conditional-count aggregation (one scan however many checks ride it).
    */
  def constraintCounts(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val aggs = checks.map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(name) }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.map { case (name, _) =>
      struct(lit(name).as("check"), coalesce(col(name), lit(0L)).as("n_violations")) }
    one.select(explode(array(entries: _*)).as("c")).select(col("c.*"))
  }

  /** Orphan-key count: rows of `child` whose `childKey` has no match in
    * `parent.parentKey` (referential-integrity violation count). Equi
    * anti-join on the key — shuffles on the key at scale, AQE broadcasts
    * under the threshold. */
  def orphanCount(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))

  /** Per-group quantile cap: compute quantile `q` of `valueCol` per group
    * (exact, linear interpolation — engine-portable at round(…,6)), then
    * tag every row keep/drop against its group's cap. Returns per-group
    * (cap, n_total, n_kept, n_dropped).
    *
    * Shape: the caps table is group-vocabulary-sized → broadcast back; the
    * corpus path is scan → broadcast join → conditional count. The exact
    * per-group percentile is one sort-based aggregation over the group's
    * values — the piece that becomes a t-digest at petabyte group sizes. */
  /** The approximate twin of [[quantileTrimStats]]'s cap computation —
    * `percentile_approx` (a positional sketch with bounded `accuracy`
    * memory) instead of the exact sort-based percentile: per-group state
    * stops growing with group size, the trade a petabyte-scale trim makes.
    * The spec bounds its caps against the exact ones. */
  def approxQuantileCaps(df: DataFrame, groupCol: String, valueCol: String,
                         q: Double, accuracy: Int = 10000): DataFrame =
    df.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol), lit(q), lit(accuracy))
        .cast("double").as("cap_approx"))

  /** Equi-width histogram: `nBins` equal-width bins over the OBSERVED
    * [min, max] of `valueCol`. Two passes: a 1-row min/max aggregate
    * broadcast onto the scan, then one map-side-combinable bin count.
    * The max value itself is clamped into the last bin (`least`). Bin
    * boundaries (`bin_lo`/`bin_hi`) are recomputed with the same IEEE
    * expression shape the binning used, so the oracle replays them
    * bit-identically — no rounding anywhere.
    *
    * Scale shape: two scans (stats + counts), zero shuffles beyond the
    * two aggregations; output is `nBins` rows. The empty-bin case keeps its
    * row absent by design (gap-fill is [[graft.ext.Events.gapFillDaily]]'s
    * job; a histogram over 100 TB still fits in a calendar-sized frame). */
  def equiWidthHistogram(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    val stats = df.agg(min(col(valueCol)).cast("double").as("_mn"),
      max(col(valueCol)).cast("double").as("_mx"))
    val w = (col("_mx") - col("_mn")) / lit(nBins.toDouble)
    // degenerate single-value column (min == max): w is 0 and the division
    // below would null out (Spark divides-by-zero to null, which `least`
    // then SKIPS — dumping every row in bin nBins-1); short-circuit to one
    // bin [mn, mn] instead. The oracle replays the same CASE guard.
    val bin = when(col("_mx") === col("_mn"), lit(0L))
      .otherwise(least(floor((col("_v") - col("_mn")) / w), lit(nBins - 1L))
        .cast("long"))
    df.select(col(valueCol).cast("double").as("_v"))
      .crossJoin(broadcast(stats))
      .select(bin.as("bin"), col("_mn"), w.as("_w"))
      .groupBy(col("bin"))
      .agg(first(col("_mn") + col("bin") * col("_w")).as("bin_lo"),
        first(col("_mn") + (col("bin") + 1) * col("_w")).as("bin_hi"),
        count(lit(1)).as("n_rows"))
  }

  def quantileTrimStats(df: DataFrame, groupCol: String, valueCol: String,
                        q: Double): DataFrame = {
    val capsExact = df.groupBy(col(groupCol))
      .agg(round(expr(s"percentile($valueCol, $q)"), 6).as("cap"))
    df.join(broadcast(capsExact), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        first(col("cap")).as("cap"),
        count(lit(1)).as("n_total"),
        sum(when(col(valueCol) <= col("cap"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col(valueCol) > col("cap"), 1L).otherwise(0L)).as("n_dropped"))
  }
}
