package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — point ∈ [lo, hi). Spark plans the
  * naive inequality join as BroadcastNestedLoop; this binned formulation
  * explodes each interval into the fixed-width bins it covers and equi-joins
  * points on their bin, turning the O(n·m) scan into a shuffled hash join —
  * the 100 TB shape. A point matches an interval through exactly one bin
  * (its own), so no post-join dedup is needed.
  */
object RangeJoin {

  /** Point-side-preserving types only: right/full would emit an unmatched
    * interval once per bin it covers. The range predicate lives in the JOIN
    * CONDITION, not a post-join filter — a filter would silently turn a left
    * join back into inner by dropping the null-extended rows. */
  def binnedRangeJoin(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "leftouter", "left_outer")(joinType.toLowerCase),
      s"binnedRangeJoin supports inner/left; '$joinType' would emit each " +
        s"unmatched interval once per covered bin")
    val p = points.withColumn("_pbin", floor(col(pointCol) / binWidth).cast("long"))
    val iv = intervals.withColumn("_ibin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor((col(hiCol) - lit(1e-9)) / binWidth).cast("long"))))
    p.join(iv,
        col("_pbin") === col("_ibin") &&
          col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol),
        joinType)
      .drop("_pbin", "_ibin")
  }
}
