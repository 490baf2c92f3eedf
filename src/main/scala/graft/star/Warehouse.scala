package graft.star

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet-backed warehouse: one directory per table under `dir`. Stands in
  * for the reference's Postgres schema (no JDBC target in this harness —
  * SURVEY.md §2.1 S6). Overwrites stage through a temp dir + rename so a
  * table can be rebuilt from a plan that reads it (the U2 merge case).
  */
final class Warehouse(val spark: SparkSession, val dir: String) {

  private def path(table: String) = new Path(s"$dir/$table")
  private def fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A table exists only if it has at least one DATA file — a dir holding
    * just a `_SUCCESS` marker (e.g. from appending an empty frame before the
    * table was ever loaded) is not a table; reading it would fail schema
    * inference. */
  def exists(table: String): Boolean = {
    val p = path(table)
    fs.exists(p) && fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      s.isDirectory || (!n.startsWith("_") && !n.startsWith("."))
    }
  }

  def read(table: String): DataFrame = spark.read.parquet(path(table).toString)

  def readIfExists(table: String): Option[DataFrame] =
    if (exists(table)) Some(read(table)) else None

  // Small-dim read cache: one star load scans each lookup dim at several
  // join sites (resolution joins, anti-joins, maxId aggs). Caching makes
  // that one parquet scan + in-memory reuse per load; any write to the
  // table invalidates. Only true lookup dims belong here — fact-scale
  // tables (vehicle_dim, auction_fact, staging) must use `read`.
  private val dimCache = scala.collection.mutable.Map.empty[String, DataFrame]

  def readCached(table: String): DataFrame = synchronized {
    dimCache.getOrElseUpdate(table,
      read(table).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  def readIfExistsCached(table: String): Option[DataFrame] =
    if (exists(table)) Some(readCached(table)) else None

  private def invalidate(table: String): Unit = synchronized {
    dimCache.remove(table).foreach(_.unpersist())
    maxIds.remove(table)
    ()
  }

  /** Release every block this Warehouse pinned in the session: the
    * persisted dim caches. Without this, a temp warehouse that goes out of
    * scope leaks its storage blocks until a JVM GC cycle lets Spark's
    * ContextCleaner reap them — across a long session of many composed
    * loads that is a storage-memory leak that evicts LIVE caches mid-query.
    * Reads after close still work (the cache repopulates on demand). */
  def close(): Unit = synchronized {
    dimCache.valuesIterator.foreach(_.unpersist())
    dimCache.clear()
  }

  // Surrogate-id high-water marks: an incremental load re-derives each dim's
  // max(id) as a scalar agg — one driver action per dim per load. The
  // insert-only path KNOWS the new max (old max + rows appended), so it
  // records it and the next load skips the agg. Any other write to the table
  // drops the entry (computed lazily again).
  private val maxIds = scala.collection.mutable.Map.empty[String, Long]

  /** Cached max surrogate id for `table`, computing via `compute` on miss. */
  private[graft] def cachedMaxId(table: String)(compute: => Long): Long = {
    synchronized(maxIds.get(table)) match {
      case Some(v) => v
      case None =>
        val v = compute
        synchronized { maxIds(table) = v }
        v
    }
  }

  /** Record the known max id after an append of contiguous fresh ids. */
  private[graft] def recordMaxId(table: String, v: Long): Unit =
    synchronized { maxIds(table) = v }

  /** The cached high-water mark if known — lets batch callers fuse ALL
    * their miss computations into one action instead of one scalar agg per
    * table ([[Dims.loadSimpleDimsFused]]). */
  private[graft] def peekMaxId(table: String): Option[Long] =
    synchronized(maxIds.get(table))

  /** Append new rows (the U1 insert-only path — callers anti-join first). */
  def append(table: String, df: DataFrame): Unit = {
    df.write.mode(SaveMode.Append).parquet(path(table).toString)
    invalidate(table)
  }

  /** Append + row count in ONE action: an [[org.apache.spark.sql.Observation]]
    * on the write plan counts rows as they stream to the files. Replaces the
    * count-then-append double action — each of which re-runs the full input
    * plan (anti-join, resolution joins) at warehouse scale — and removes the
    * need to persist the input just to keep the two actions consistent.
    * Appending zero rows is safe: Spark writes a schema-bearing empty part
    * file, so a table created by an empty append is readable (valid schema,
    * zero rows) — and [[exists]] additionally guards against _SUCCESS-only
    * dirs, which would fail schema inference. */
  def appendCounted(table: String, df: DataFrame): Long = {
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .write.mode(SaveMode.Append).parquet(path(table).toString)
    invalidate(table)
    obs.get("n").asInstanceOf[Long]
  }

  /** Full rewrite via staging + rename swap (safe when `df`'s plan reads the
    * table being replaced). The old table is renamed ASIDE, the staged data
    * renamed in, and only then is the old data deleted — so the no-table
    * window is two metadata renames, not a recursive delete, and a crash
    * mid-swap leaves the previous data recoverable at the aside path instead
    * of gone. */
  def overwrite(table: String, df: DataFrame): Unit =
    overwriteWithProbe(table, df, _ => ())

  /** [[overwrite]] with a step-boundary callback so specs can assert the
    * table stays visible across the swap. */
  private[graft] def overwriteWithProbe(table: String, df: DataFrame,
                                        probe: String => Unit): Unit = {
    val tmp = new Path(s"$dir/.${table}_tmp")
    val aside = new Path(s"$dir/.${table}_old")
    // Tag the write's jobs (thread-local, so concurrent loads don't cross):
    // specs assert the session conf its jobs ran under — e.g. that an
    // overlapped staging dump never plans inside a latency-conf window
    // (StarLoad.run's toggle scoping).
    val sc = spark.sparkContext
    val prevDesc = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"graft.overwrite:$table")
    try {
      df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    } finally sc.setJobDescription(prevDesc)
    probe("staged")
    if (fs.exists(aside)) fs.delete(aside, true)
    val target = path(table)
    val hadOld = fs.exists(target)
    if (hadOld) fs.rename(target, aside)
    fs.rename(tmp, target)
    probe("swapped")
    if (hadOld) fs.delete(aside, true)
    probe("cleaned")
    invalidate(table)
  }

  /** Rewrite ONLY the partitions present in `df` (dynamic partition
    * overwrite) — files in untouched partitions are left as-is, so a keyed
    * upsert costs O(affected partitions), not O(table). The incoming plan may
    * read the target table itself: lineage is cut with an eager
    * `localCheckpoint` (executor-local blocks) instead of a staging-dir
    * round-trip, so the merged data is written to the table exactly once. */
  def overwritePartitions(table: String, df: DataFrame, partitionCol: String,
                          alreadySnapped: Boolean = false): Unit = {
    val snapped = if (alreadySnapped) df else df.localCheckpoint()
    snapped.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path(table).toString)
    invalidate(table)
  }

  def truncateInsert(table: String, df: DataFrame): Unit = overwrite(table, df)
}
