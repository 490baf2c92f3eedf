package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix budget allocation: capped proportional (water-filling)
  * distribution of a token budget across domains.
  *
  * The problem every data-mixture recipe ends at: spend budget B across
  * domains proportionally to configured weights w_d, except no domain can
  * contribute more than it HAS (cap_d tokens available). The classical
  * solution is water-filling: alloc_d = min(cap_d, λ·w_d) with the water
  * level λ chosen so the allocations sum to B — small domains saturate at
  * their cap, the freed budget redistributes over the rest.
  *
  * The relational spelling (no iteration): sort domains by saturation
  * order r_d = cap_d/w_d ascending — the saturated set is always a prefix
  * of that order — and find the FIRST domain whose cap exceeds its
  * proportional share of the budget remaining after all earlier caps:
  *
  *   cut = min { i : cap_i · Σ_{j≥i} w_j > (B − Σ_{j<i} cap_j) · w_i }
  *
  * Domains before the cut saturate (alloc = cap); domains from the cut on
  * share the remaining budget proportionally, floored to integers:
  * alloc = w_d·R div W_rem with R, W_rem the remaining budget/weight at
  * the cut. For d past the cut, r_d ≥ r_cut > λ guarantees the floored
  * share stays below cap_d. No cut ⇒ B ≥ Σcap and every domain saturates
  * (the leftover budget is simply unspent).
  *
  * Determinism: the sort key is one IEEE division (bit-identical in any
  * engine) with the domain as tiebreak; the cut test and the allocations
  * are exact integer arithmetic in DECIMAL(38,0) (≡ DuckDB HUGEINT), so
  * products like cap·Σw can't overflow at 100 TB token counts.
  *
  * Scale shape: the windows run over the DOMAIN table — bounded by the
  * mixture configuration (tens to thousands of rows), never by the
  * corpus — on one partition (the non-foldable constant-key idiom, see
  * NOTES on [[Sampling.prioritySample]]); the corpus-scale work (building
  * per-domain caps) happens upstream in an ordinary aggregation.
  */
object Mixture {

  /** Allocate `budget` over `domains` (one row per domain: an id, an
    * integral weight > 0, an integral cap ≥ 0). Adds `alloc` (tokens
    * granted) and `saturated` (1 = capped at its inventory). */
  def waterFill(domains: DataFrame, domainCol: String, weightCol: String,
                capCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val wholeKey = substring(col(domainCol).cast("string"), 0, 0)
    val ord = Window.partitionBy(wholeKey)
      .orderBy((col(capCol).cast("double") / col(weightCol).cast("double")).asc,
        col(domainCol).asc)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(wholeKey)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    domains
      .withColumn("_i", row_number().over(ord))
      .withColumn("_pcap", sum(col(capCol)).over(run) - col(capCol))
      .withColumn("_pw", sum(col(weightCol)).over(run) - col(weightCol))
      .withColumn("_wtot", sum(col(weightCol)).over(whole))
      .withColumn("_fail", when(expr(
        s"CAST($capCol AS DECIMAL(38,0)) * CAST(_wtot - _pw AS DECIMAL(38,0)) > " +
          s"CAST(${budget}L - _pcap AS DECIMAL(38,0)) * CAST($weightCol AS DECIMAL(38,0))"),
        col("_i")))
      .withColumn("_cut", min(col("_fail")).over(whole))
      // R and W_rem read off the cut row (exactly one row matches _cut)
      .withColumn("_rcut",
        min(when(col("_i") === col("_cut"), col("_pcap"))).over(whole))
      .withColumn("_wcut",
        min(when(col("_i") === col("_cut"), col("_pw"))).over(whole))
      .select(col(domainCol), col(weightCol), col(capCol),
        when(col("_cut").isNull || col("_i") < col("_cut"), col(capCol))
          .otherwise(least(col(capCol), expr(
            s"CAST(${budget}L - _rcut AS DECIMAL(38,0)) * CAST($weightCol AS DECIMAL(38,0))" +
              s" div CAST(_wtot - _wcut AS DECIMAL(38,0))")))
          .cast("long").as("alloc"),
        (col("_cut").isNull || col("_i") < col("_cut")).cast("int")
          .as("saturated"))
  }
}
