package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch-padding efficiency audit — the training-throughput "so what" of
  * token counting (q28) and sequence packing (the q54 family): a batch of
  * documents pads every member to the batch's longest sequence, so tokens
  * processed = Σ_batch n_rows·max_len, and the gap to Σ len is pure padding
  * — wasted FLOPs. This audit quantifies, AS DATA, what length-aware
  * batching buys: policy `hash` (the default shuffle — batches are a random
  * mix, max_len ≈ corpus max) vs policy `bucketed` (group docs into
  * `bucketWidth`-wide length buckets first, then hash WITHIN the bucket —
  * per-row padding is bounded by bucketWidth−1 by construction).
  *
  * Both policies are WINDOW-FREE on purpose: batch membership is a pure
  * hash expression (a global row_number batcher is the all-rows-to-one-task
  * funnel this codebase audits against), so the assignment expression
  * itself is what a 100 TB writer would partition by. Batch statistics are
  * one map-side-combined aggregation keyed on O(N/batchSize) batch ids;
  * the policy rollup is bounded. The only broadcast is the per-bucket
  * batch-count table (O(maxSeqLen/bucketWidth) rows).
  *
  * All arithmetic is exact integers (counts, sums, integral-division basis
  * points), so the oracle replays bit-for-bit.
  */
object Batching {

  /** Deterministic 60-bit doc hash (salt distinct from the other streams). */
  private def batHash(c: Column): Column =
    conv(substring(md5(concat(lit("bat:"), c.cast("string")).cast("binary")), 1, 15), 16, 10)
      .cast("bigint")

  /** Per-policy padding audit: one row per policy with n_batches, n_rows,
    * useful/cost/padding token totals and padding_bp. Sequences truncate at
    * `maxSeqLen` (the training contract). */
  def paddingAudit(docs: DataFrame, idCol: String, textCol: String,
                   maxSeqLen: Int = 128, batchSize: Int = 8,
                   bucketWidth: Int = 16): DataFrame = {
    require(maxSeqLen >= 1 && batchSize >= 1 && bucketWidth >= 1,
      s"positive maxSeqLen/batchSize/bucketWidth required, got " +
        s"$maxSeqLen/$batchSize/$bucketWidth")
    val base = docs.select(col(idCol).as("_id"),
        least(size(split(col(textCol), " ")), lit(maxSeqLen)).cast("long").as("len"))
      .withColumn("_h", batHash(col("_id")))
    val n = base.groupBy().agg(count(lit(1)).as("_n"))

    // policy `hash`: batch = h mod ceil(N / batchSize)
    // greatest(·, 1): an empty input gives _n = 0 hence _nb = 0, and pmod
    // by zero is an ANSI error — clamp so the empty frame flows through to
    // the zero-row report instead.
    val hashed = base.join(broadcast(n))
      .withColumn("_nb",
        greatest(expr(s"(_n + ${batchSize - 1}) div $batchSize"), lit(1L)))
      .withColumn("batch", pmod(col("_h"), col("_nb")))
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n_rows"), max(col("len")).as("max_len"),
        sum(col("len")).as("useful"))

    // policy `bucketed`: length bucket first, hash within the bucket
    val buckets = base.withColumn("bucket", expr(s"len div $bucketWidth"))
    val bCounts = buckets.groupBy(col("bucket")).agg(count(lit(1)).as("_bn"))
    val bucketed = buckets.join(broadcast(bCounts), "bucket")
      .withColumn("_nb",
        greatest(expr(s"(_bn + ${batchSize - 1}) div $batchSize"), lit(1L)))
      .withColumn("sub", pmod(col("_h"), col("_nb")))
      .groupBy(col("bucket"), col("sub"))
      .agg(count(lit(1)).as("n_rows"), max(col("len")).as("max_len"),
        sum(col("len")).as("useful"))

    def rollup(perBatch: DataFrame, policy: String): DataFrame =
      perBatch
        .withColumn("cost", col("n_rows") * col("max_len"))
        .groupBy()
        .agg(count(lit(1)).as("n_batches"),
          coalesce(sum(col("n_rows")), lit(0L)).as("n_rows"),
          coalesce(sum(col("useful")), lit(0L)).as("useful_tokens"),
          coalesce(sum(col("cost")), lit(0L)).as("cost_tokens"))
        .withColumn("padding_tokens", col("cost_tokens") - col("useful_tokens"))
        .withColumn("padding_bp",
          when(col("cost_tokens") > 0,
            expr("(10000 * padding_tokens) div cost_tokens")).otherwise(lit(0L)))
        .select(lit(policy).as("policy"), col("n_batches"), col("n_rows"),
          col("useful_tokens"), col("cost_tokens"), col("padding_tokens"),
          col("padding_bp"))

    rollup(hashed, "hash").unionByName(rollup(bucketed, "bucketed"))
  }
}
