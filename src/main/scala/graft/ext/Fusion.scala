package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the standard
  * way a retrieval pipeline combines two independent candidate lists (e.g.
  * a sign-LSH ANN pass and an IVF ANN pass) into one ranking without score
  * calibration: rrf(d) = Σ_lists 1/(k0 + rank_list(d)).
  *
  * Scale shape: the inputs are already bounded per-query top-k lists
  * (O(queries·k) rows), so the rank windows and the full-outer merge run
  * over bounded data — the expensive part of retrieval stays in the ANN
  * operators, fusion is a cheap bounded join. Exactness: ranks are
  * integers, each reciprocal is a single IEEE division, and each fused
  * score is one two-term IEEE sum — bit-identical across engines (no
  * rounding, no order-dependent accumulation).
  */
object Fusion {

  /** Rank a (query_id, cand_id, sim) candidate list the way the TopK
    * aggregator orders it: sim desc, cand_id asc tie-break. */
  private def ranked(list: DataFrame, rankCol: String): DataFrame =
    list.select(col("query_id"), col("cand_id"),
      row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("sim").desc, col("cand_id")))
        .cast("bigint").as(rankCol))

  /** Fuse two per-query candidate lists. Output: one row per candidate
    * surfaced by either list, with its rank in each (null = not retrieved
    * by that list), the RRF score, and the fused rank. */
  def reciprocalRankFusion(listA: DataFrame, listB: DataFrame,
                           rankAName: String = "rank_a",
                           rankBName: String = "rank_b",
                           k0: Int = 60): DataFrame = {
    def reciprocal(rank: String) =
      coalesce(lit(1.0) / (lit(k0) + col(rank)).cast("double"), lit(0.0))
    ranked(listA, rankAName)
      .join(ranked(listB, rankBName), Seq("query_id", "cand_id"), "full_outer")
      .withColumn("rrf_score", reciprocal(rankAName) + reciprocal(rankBName))
      .withColumn("fused_rank",
        row_number().over(
            Window.partitionBy(col("query_id"))
              .orderBy(col("rrf_score").desc, col("cand_id")))
          .cast("bigint"))
  }
}
