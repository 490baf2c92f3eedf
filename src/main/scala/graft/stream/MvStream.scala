package graft.stream

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.ext.Mv

/** Continuous materialized-view maintenance: each micro-batch of fact rows
  * is partial-aggregated and merged into a parquet-backed aggregate view
  * via [[Mv.mergeAggregates]] — the streaming twin of the q92 batch
  * refresh (a lakehouse continuous aggregate).
  *
  * Exactly-once: unlike SCD2's idempotent merge, SUM/COUNT merges double-
  * count on re-delivery, so the view carries the last applied batch id in a
  * `_LAST_BATCH` marker INSIDE the state directory — published by the same
  * atomic rename as the data, so state and marker can never diverge. A
  * crash-replayed batch (same id) is detected and skipped; parquet readers
  * ignore `_`-prefixed files.
  *
  * Scale shape: per batch, one map-side-combined partial aggregate of ONLY
  * the new rows plus one O(groups)+O(groups) merge — the fact history is
  * never rescanned.
  */
object MvStream {

  /** Process every fact file currently in `factsDir` (parquet, schema
    * `schema`), folding `partial(batch)` into the view at `viewDir`.
    * `partial` must produce the view's exact schema (keys + summable
    * partials). `maxFilesPerTrigger = Some(1)` gives per-file batches —
    * the deterministic-replay configuration the spec exercises. */
  def runAvailableNow(spark: SparkSession, factsDir: String,
                      schema: StructType, viewDir: String,
                      checkpointDir: String, keys: Seq[String],
                      partial: DataFrame => DataFrame,
                      maxFilesPerTrigger: Option[Int] = None,
                      merge: Option[(DataFrame, DataFrame) => DataFrame] = None): Unit = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val q = reader.parquet(factsDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          applyBatch(spark, viewDir, partial(batch), keys, batchId, merge)
      }
      .start()
    q.awaitTermination()
  }

  /** Fold one batch partial into the view; a batch id at or below the
    * view's `_LAST_BATCH` marker is a crash re-delivery and is skipped.
    *
    * `merge` defaults to the SUM-partial fold ([[Mv.mergeAggregates]] on
    * `keys`) — the continuous-aggregate contract. A non-SUM mergeable
    * state (a KMV sketch's k-min set union, a MAX-register fold) supplies
    * its own (base, delta) => merged; the exactly-once marker, atomic
    * publish and crash rollback are merge-agnostic and shared. */
  def applyBatch(spark: SparkSession, viewDir: String, partial: DataFrame,
                 keys: Seq[String], batchId: Long,
                 merge: Option[(DataFrame, DataFrame) => DataFrame] = None): Unit = {
    if (lastApplied(spark, viewDir).exists(_ >= batchId)) return
    val mergeFn = merge.getOrElse(Mv.mergeAggregates(_: DataFrame, _: DataFrame, keys))
    val merged = readView(spark, viewDir).map(mergeFn(_, partial))
      .getOrElse(partial)
    publish(spark, viewDir, merged, batchId)
  }

  /** Single-writer crash recovery: a crash between [[publish]]'s two
    * renames leaves the primary dir MISSING with the previous state parked
    * at `._mv_old` (and the new state staged at `._mv_tmp`). Reading
    * "missing" as "empty" there would silently drop the whole view, so
    * every read first rolls the `_old` dir back — a fully-consistent
    * (state, marker) pair one batch behind; the streaming engine then
    * re-delivers that batch and the merge re-applies it, and exactly-once
    * resumes. (Primary present ⇒ nothing to do: a crash after the second
    * rename only leaves stale side dirs, which the next publish clears.) */
  private def recoverIfInterrupted(spark: SparkSession, viewDir: String): Unit = {
    val p = new Path(viewDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(viewDir.stripSuffix("/") + "._mv_old")
    if (!fs.exists(p) && fs.exists(old)) {
      require(fs.rename(old, p), s"mv: could not roll back $old")
      fs.delete(new Path(viewDir.stripSuffix("/") + "._mv_tmp"), true)
    }
  }

  def readView(spark: SparkSession, viewDir: String): Option[DataFrame] = {
    recoverIfInterrupted(spark, viewDir)
    val p = new Path(viewDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(viewDir)) else None
  }

  def lastApplied(spark: SparkSession, viewDir: String): Option[Long] = {
    recoverIfInterrupted(spark, viewDir)
    val p = new Path(viewDir.stripSuffix("/") + "/_LAST_BATCH")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  /** Stage data + marker together, then swap directories — the merge reads
    * the state it replaces (same idiom as [[Scd2Stream]]/`etl/Compact`). */
  private def publish(spark: SparkSession, viewDir: String, df: DataFrame,
                      batchId: Long): Unit = {
    val staged = viewDir.stripSuffix("/") + "._mv_tmp"
    df.write.mode(SaveMode.Overwrite).parquet(staged)
    val fs = new Path(viewDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(staged + "/_LAST_BATCH"), true)
    try out.write(batchId.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val p = new Path(viewDir)
    if (fs.exists(p)) {
      val old = new Path(viewDir.stripSuffix("/") + "._mv_old")
      fs.delete(old, true)
      require(fs.rename(p, old), s"mv: could not move $viewDir aside")
      require(fs.rename(new Path(staged), p), s"mv: could not publish $staged")
      fs.delete(old, true)
    } else {
      require(fs.rename(new Path(staged), p), s"mv: could not publish $staged")
    }
  }
}
