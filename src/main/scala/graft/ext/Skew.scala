package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §7.4 "100 TB design rules").
  * AQE's skew-join handles sort-merge joins at runtime; these helpers cover
  * the cases it can't: broadcast-ineligible skewed joins and skewed
  * aggregations where one key floods a single reducer.
  */
object Skew {

  /** Join types saltedJoin supports: inner and big-side-preserving only.
    * Small-side-preserving types (right/full) are rejected — the small side
    * is replicated once per salt, so each of its unmatched rows would be
    * emitted `salts` times. */
  private val BigSidePreserving =
    Set("inner", "left", "leftouter", "left_outer", "leftsemi", "left_semi",
      "leftanti", "left_anti")

  /** Salted equi-join: the big (skewed) side gets a uniform salt in
    * [0, salts); the small side is replicated once per salt value, and the
    * join key becomes (key, salt) — a hot key now spreads over `salts`
    * reducers. Salt choice never affects the result, only placement. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(BigSidePreserving(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti; '$joinType' would " +
        s"emit each unmatched small-side row once per salt")
    val salted = big.withColumn("_salt", (rand(42) * salts).cast("int"))
    val replicated = small.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase salted aggregation: partial aggregate on (key, salt), then
    * combine per key — the hot key's partial states land on many reducers
    * first. Works for any algebraic aggregate expressed as (partial, final)
    * column pairs; count/sum provided as the canonical instance. Pass a
    * DECIMAL-cast value when exact (salt-order-independent) sums matter. */
  def saltedSumCount(df: DataFrame, key: String, value: Column,
                     salts: Int): DataFrame =
    df.withColumn("_salt", (rand(42) * salts).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(sum(value).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("n"))

  /** Reducer-balance PLANNING audit — the before-the-job answer to "what
    * does `spark.sql.shuffle.partitions` need to be, and will a hot key
    * flood one reducer anyway?". For each candidate reducer count P it
    * simulates hash partitioning (reducer = 60-bit salted md5 of the key,
    * mod P — deterministic, so the oracle replays placement exactly) and
    * reports the load profile: reducers actually hit, the heaviest
    * reducer's rows, and its load in basis points of ideal (10000 =
    * perfectly balanced; a key carrying 30% of the corpus pins
    * max_load_bp near 3000·P regardless of P — the signature that says
    * "salt this key", i.e. [[saltedSumCount]], not "raise partitions").
    *
    * Scale shape: everything after the first aggregation runs on the KEY
    * HISTOGRAM (one corpus-scale map-side-combined groupBy — the same
    * histogram a stats pass already materializes), exploded |candidates|
    * times: O(NDV·|candidates|) rows, then two bounded rollups. AQE
    * coalesces/splits at runtime; this is the plan-ahead artifact for
    * sizing before the shuffle exists. */
  def reducerBalanceAudit(df: DataFrame, keyCol: Column,
                          candidates: Seq[Int]): DataFrame = {
    require(candidates.nonEmpty && candidates.forall(_ >= 1),
      s"need at least one candidate reducer count >= 1, got $candidates")
    val keyed = df.select(keyCol.as("_k"))
      .groupBy(col("_k")).agg(count(lit(1)).as("cnt"))
      .withColumn("_h", conv(substring(md5(concat(lit("shf:"),
        col("_k").cast("string")).cast("binary")), 1, 15), 16, 10).cast("bigint"))
    keyed
      .withColumn("p", explode(array(candidates.map(lit): _*)))
      .withColumn("reducer", col("_h") % col("p"))
      .groupBy(col("p"), col("reducer"))
      .agg(sum(col("cnt")).as("load"), count(lit(1)).as("n_keys"))
      .groupBy(col("p").as("candidate_p"))
      .agg(count(lit(1)).as("n_used"),
        sum(col("load")).as("n_rows"),
        max(col("load")).as("max_rows"),
        max(col("n_keys")).as("max_keys"))
      .withColumn("max_load_bp",
        expr("(max_rows * candidate_p * 10000) div n_rows"))
  }
}
