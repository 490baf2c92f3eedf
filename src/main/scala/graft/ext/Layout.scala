package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering keys for multi-column
  * file skipping.
  *
  * A 100 TB table sorted on one column prunes scans on that column only;
  * interleaving the bits of k columns gives a single sort key whose
  * contiguous ranges are small hyper-rectangles in all k dimensions — files
  * written in z-order carry tight min/max stats on EVERY interleaved column,
  * so predicates on any of them skip files (the layout trick behind
  * Delta/Iceberg `ZORDER BY`). The z-value is a pure per-row bit expression
  * (codegen'd shifts and masks, no UDF, no shuffle); the layout write is one
  * range-repartition on it.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of each column (non-negative
    * integral values < 2^bits — caller guarantees range, e.g. by bucketing
    * continuous dimensions first). Column j contributes its bit i to result
    * bit `i * k + j`. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 1, "zValue needs at least one column")
    require(bits >= 1 && bits * k <= 63, s"bits * cols must fit a long, got $bits * $k")
    val terms =
      for { i <- 0 until bits; (c, j) <- cols.zipWithIndex }
        yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Hilbert-curve clustering key — [[zValue]]'s companion with strictly
    * better worst-case range locality (no Morton diagonal jumps); see
    * [[graft.functions.HilbertIndex]] for the design discussion. Same
    * range contract: non-negative values < 2^bits per dimension. */
  def hilbertValue(xCol: Column, yCol: Column, bits: Int): Column = {
    require(bits >= 1 && 2 * bits <= 62, s"2 * bits must fit a long, got $bits")
    graft.functions.HilbertIndex.hilbertIndex(
      xCol.cast("long"), yCol.cast("long"), bits)
  }

  /** Rewrite `df` into z-order: range-partition on the z-value (so file N's
    * z-range precedes file N+1's) and sort within partitions. `numFiles`
    * bounds output file count; the z column itself is dropped — it is a
    * layout key, not data. */
  def zorderBy(df: DataFrame, dims: Seq[Column], bits: Int,
               numFiles: Int): DataFrame = {
    val keyed = df.withColumn("_z", zValue(dims, bits))
    keyed.repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** Small-file compaction planner — the OPTIMIZE/rewrite-data-files
    * planning step of Delta/Iceberg maintenance: a 100 TB table ingested
    * in small increments accumulates files far below the scan-efficient
    * size, and the planner groups them into target-size output bins
    * WITHOUT reading data — file-level metadata only. Files are packed by
    * BOUNDARY-CROSSING QUOTIENT BINNING in `orderCol` order within each
    * partition (time-ordered packing preserves clustering, so the
    * rewritten files keep their min/max pruning power): file i's bin is
    * the integer quotient of the running size BEFORE it —
    * bin = prefix_bytes div targetBytes, one window cumsum, pure integer.
    * Unlike true next-fit, a file straddling a target boundary stays in
    * the bin its prefix opened, so a bin may overfill past `targetBytes`
    * (its `fill_bp` exceeds 10000) — the trade is a closed-form bin id
    * (no sequential scan state) for bounded overfill of at most one file
    * per bin; files are never split.
    *
    * Output per (partition, bin): file count, total bytes, and fill ratio
    * in basis points — the review artifact a maintenance job executes.
    *
    * Scale shape: one partition-keyed window over FILE METADATA rows
    * (millions of rows for a 100 TB table, not billions) and one bounded
    * aggregation; no data files are opened. */
  def compactionPlan(files: DataFrame, partCol: String, orderCol: String,
                     sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(Long.MinValue, 0)
    files
      .withColumn("_cum", sum(col(sizeCol)).over(w))
      .withColumn("bin", expr(s"(_cum - $sizeCol) div ${targetBytes}L"))
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col(sizeCol)).as("total_bytes"))
      .withColumn("fill_bp", expr(s"10000 * total_bytes div ${targetBytes}L"))
  }

  /** Rendezvous (highest-random-weight) shard assignment: item → the shard
    * s ∈ [0, nShards) maximizing md5(salt:s:item) (Thaler & Ravishankar,
    * IEEE/ACM ToN '98 — the consistent-hashing scheme behind cache routing
    * and shard placement). The property a 100 TB re-shard needs: growing
    * nShards from N to N+m moves ONLY items captured by the m new shards
    * (each old shard's hash is unchanged, so an item moves iff some new
    * shard's hash beats its old max) — expected churn m/(N+m), vs ~100% for
    * `hash(id) % n`. Pure per-row expression — nShards md5 calls, a max and
    * a match, all codegen'd, no shuffle, no state ring to store; md5
    * equality across distinct shard strings never happens, so the argmax is
    * well-defined and every engine agrees on it.
    *
    * Spelling matters at per-row cost: the hashes are materialized ONCE
    * into an array and the winner is `array_position(hs, array_max(hs))`,
    * so each md5 is evaluated exactly once per row — a `greatest` +
    * when-chain argmax would re-reference every hash ~nShards times and
    * (absent full subexpression elimination) pay O(n²) md5 evaluations. */
  def rendezvousShard(idCol: Column, nShards: Int,
                      salt: String = "graft-hrw"): Column = {
    require(nShards >= 2, s"nShards must be at least 2, got $nShards")
    val hs = array((0 until nShards).map(s =>
      md5(concat(lit(s"$salt:$s:"), idCol.cast("string")).cast("binary"))): _*)
    (array_position(hs, array_max(hs)) - 1).cast("int")
  }

  /** Consistent-hash RING assignment with virtual nodes — the other
    * classical minimal-churn scheme ([[graft.functions.RingShard]] has
    * the design discussion): each shard owns `vnodes` deterministic
    * 60-bit positions, items map to their successor position's shard.
    * Same m/(N+m) churn law as [[rendezvousShard]], O(log(N·vnodes)) per
    * item instead of O(N) hashes — the trade rings make at large N; the
    * vnode count trades assignment work for balance variance. The ring is
    * built driver-side (a pure function of the parameters, no data) and
    * rides into codegen as a sorted constant. */
  def ringShard(idCol: Column, nShards: Int, vnodes: Int,
                salt: String = "graft-ring"): Column = {
    require(nShards >= 2, s"nShards must be at least 2, got $nShards")
    require(vnodes >= 1, s"vnodes must be at least 1, got $vnodes")
    val ring = (for {
      s <- 0 until nShards
      v <- 0 until vnodes
    } yield (graft.functions.RingKernel.hash60(s"$salt:v:$s:$v"), s))
      .sortBy(_._1)
    require(ring.map(_._1).distinct.size == ring.size,
      "vnode hash collision — change salt") // P ≈ R²/2^61, never in practice
    graft.functions.RingShard.ringShard(idCol.cast("string"), s"$salt:i:",
      ring.map(_._1), ring.map(_._2))
  }

  /** Deterministic 60-bit row hash for range-boundary sampling (salt
    * distinct from the kmv/qsk/cms streams so sketches never correlate). */
  private def rngHash(c: Column): Column =
    conv(substring(md5(concat(lit("rng:"), c.cast("string")).cast("binary")), 1, 15), 16, 10)
      .cast("bigint")

  /** RANGE-partition boundary planning — the sort/write-layout counterpart
    * of the hash-sharding ops above, and exactly what Spark core's
    * `RangePartitioner` does before every global sort: draw a bounded
    * deterministic sample, take its equi-depth quantiles as split points,
    * and partition by "count of boundaries ≤ value". The sample here is
    * bottom-`sampleK` rows by a salted row hash (a fixed-size coordinated
    * sample, the q113/q117 idiom — reproducible across engines, retries
    * and partitionings, unlike `RangePartitioner`'s seeded XORShift), so
    * the planned boundaries are a pure function of the data.
    *
    * Scale shape: ONE `TakeOrderedAndProject` pass (O(partitions·k) rows
    * move, nothing shuffles), one single-row aggregation over the ≤ k
    * sample to rank it, and a (parts−1)-value collect — the same bounded
    * driver artifact tier as IVF centroids and the ring table; Spark core
    * collects its sort sample at the identical point. Boundary i is the
    * sample value at 1-based rank (i·s) div parts + 1 — the smallest
    * value equi-depth assigns to partition i, so with ties-right
    * assignment a full-population sample splits EXACTLY evenly. Duplicate
    * boundaries are kept: a value straddling a split keeps ALL its rows
    * on one side (ties go right), which can legitimately empty a
    * partition — callers see that in the audit, not as a silent skew. */
  def rangeBoundaries(df: DataFrame, idCol: Column, valueCol: Column,
                      parts: Int, sampleK: Int = 1024): Seq[Any] = {
    require(parts >= 2, s"parts must be at least 2, got $parts")
    require(sampleK >= parts, s"sampleK ($sampleK) must be >= parts ($parts)")
    val bounds = df
      .select(rngHash(idCol).as("_h"), valueCol.as("_v"))
      .where(col("_v").isNotNull)
      .orderBy(col("_h"), col("_v")).limit(sampleK)
      .groupBy().agg(sort_array(collect_list(col("_v"))).as("vs"))
      .select(explode(sequence(lit(1), lit(parts - 1))).as("i"), col("vs"))
      .select(element_at(col("vs"),
        expr(s"(i * size(vs)) div $parts + 1").cast("int")).as("b"))
      .collect().map(_.get(0)).toSeq
    // explode(sequence(1, parts-1)) always yields parts-1 rows, so the row
    // COUNT cannot detect a degenerate sample — but an EMPTY sample makes
    // element_at return NULL (or throw under ANSI), so validate the realized
    // boundary VALUES. A small-but-nonempty sample (parts > |sample| ≥ 1) is
    // fine by the documented semantics: ranks clamp inside the sample and
    // duplicate boundaries legitimately empty partitions.
    require(bounds.length == parts - 1 && bounds.forall(_ != null),
      s"range sample is empty (all-NULL ${valueCol} or empty input) — " +
        "cannot plan boundaries")
    bounds
  }

  /** Assign every row to its planned range partition and report the balance
    * audit: per-partition row count, value range, and relative load in
    * basis points of the ideal (10000 = perfectly balanced; the integral
    * `div` replays exactly on the oracle side). Assignment is a pure
    * per-row expression — `size(filter(boundaries, b -> v >= b))` over the
    * (parts−1)-literal array, no join, no shuffle beyond the final bounded
    * aggregation — so at 100 TB the plan costs one sample pass plus one
    * audit aggregation, and an actual re-layout write would reuse the same
    * expression as its partition key. */
  def rangePartitionAudit(df: DataFrame, idCol: Column, valueCol: Column,
                          parts: Int, sampleK: Int = 1024): DataFrame = {
    val bounds = rangeBoundaries(df, idCol, valueCol, parts, sampleK)
    val arr = array(bounds.map(b => lit(b)): _*)
    val rows = df.where(valueCol.isNotNull)
      .withColumn("_part", size(filter(arr, b => valueCol >= b)).cast("long"))
    val n = rows.groupBy().agg(count(lit(1)).as("_n"))
    rows.groupBy(col("_part").as("part_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(valueCol).as("lo_v"), max(valueCol).as("hi_v"))
      .join(broadcast(n))
      .withColumn("load_bp", expr(s"(n_rows * $parts * 10000) div _n"))
      .drop("_n")
  }
}
