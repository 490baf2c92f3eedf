package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for SUM-mergeable aggregates
  * (COUNT and SUM partials — [[mergeAggregates]] re-SUMs every non-key
  * column, so MIN/MAX partials do NOT belong in a view it maintains: they
  * need min/max merge functions and are unmaintainable under deletes
  * anyway): refresh an aggregate table by merging the OLD view with a
  * partial aggregate of only the NEW rows, instead of rescanning the full
  * fact history.
  *
  * At 100 TB this is the difference between a refresh that reads one
  * arrival partition plus an O(groups) view and one that reads the fact
  * table: the delta partial is map-side-combined before its single shuffle,
  * and the merge re-aggregates two O(groups) inputs. COUNT merges as SUM of
  * partial counts; AVG callers store (sum, count) and divide at read time.
  */
object Mv {

  /** Merge an existing aggregate view with a same-schema partial aggregate
    * of the delta: union → one re-sum by `keys`. Every non-key column must
    * be summable. Output schema is pinned to the BASE schema (Spark widens
    * DECIMAL/LONG sums; a view must not drift dtypes across refreshes). */
  def mergeAggregates(base: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val valCols = base.columns.filterNot(keys.contains).toSeq
    require(valCols.nonEmpty, "view must carry at least one aggregate column")
    base.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(valCols.head)).as(valCols.head),
        valCols.tail.map(c => sum(col(c)).as(c)): _*)
      .select(keys.map(col) ++ valCols.map(c =>
        col(c).cast(base.schema(c).dataType).as(c)): _*)
  }
}
