package graft.star

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for the star load. */
object Joins {

  /** J1 (reference Q:82-83): `s.title_state = sd.state_abbr OR s.title_state
    * = sd.state` as written forces a BroadcastNestedLoopJoin — fine at dim
    * cardinality (~50 states), wrong at scale. Scale-safe rewrite: two
    * broadcast equi-joins (abbr-keyed, then name-keyed) and coalesce the
    * looked-up id, preferring the abbr match. Zero shuffle, and exactly one
    * output row per input row (the dim is unique per key, so the OR form
    * also yields at most one match in practice).
    *
    * Returns `left` + column `idAlias` (the state_dim id, null if no match).
    */
  def disjunctiveLeftRewrite(left: DataFrame, stateDim: DataFrame,
                             leftKey: Column, idAlias: String = "state_id"): DataFrame = {
    val byAbbr = stateDim.select(col("state_abbr").as("_k_abbr"), col("id").as("_id_abbr"))
    val byName = stateDim.select(col("state").as("_k_name"), col("id").as("_id_name"))
    left
      .join(broadcast(byAbbr), leftKey === col("_k_abbr"), "left")
      .join(broadcast(byName), leftKey === col("_k_name"), "left")
      .withColumn(idAlias, coalesce(col("_id_abbr"), col("_id_name")))
      .drop("_k_abbr", "_id_abbr", "_k_name", "_id_name")
  }
}
