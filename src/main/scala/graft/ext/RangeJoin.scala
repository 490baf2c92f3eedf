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

  def binnedRangeJoin(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double, joinType: String = "inner"): DataFrame = {
    val p = points.withColumn("_bin", floor(col(pointCol) / binWidth).cast("long"))
    val iv = intervals.withColumn("_bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor((col(hiCol) - lit(1e-9)) / binWidth).cast("long"))))
    p.join(iv, Seq("_bin"), joinType)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bin")
  }
}
