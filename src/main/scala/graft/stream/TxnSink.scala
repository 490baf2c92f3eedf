package graft.stream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** EXACTLY-ONCE parquet append for `foreachBatch` — the batch-id
  * transaction log that closes the at-least-once window both persisted
  * stores ([[StreamingRedirects]], [[StreamingNearDupIndex]]) documented:
  * a crash BETWEEN a plain `mode("append")` and the streaming checkpoint
  * commit redelivers the batch on restart and duplicates rows in a store
  * downstream treats as ground truth.
  *
  * Protocol (two pieces, both under the hidden `_txn/` parent so plain
  * parquet reads of the store directory never see them):
  *
  *   1. each batch writes to its own DETERMINISTIC subdirectory
  *      (`_txn/batches/<batchId>`) in OVERWRITE mode — foreachBatch
  *      redelivers a failed batch under the SAME id, so a replay
  *      replaces its own partial output instead of appending a second
  *      copy (idempotence);
  *   2. a zero-byte COMMIT marker (`_txn/commits/<batchId>`) is created
  *      strictly AFTER the data write; [[read]] lists the markers and
  *      reads exactly the committed subdirectories, so a half-written
  *      batch is invisible to every concurrent reader (isolation), and
  *      [[append]] fast-skips a batch whose marker already exists (the
  *      restart-after-commit-before-checkpoint window).
  *
  * at-least-once delivery × idempotent isolated writes = exactly-once
  * VISIBLE rows, for any crash point: before the data write (nothing to
  * see), mid-write (uncommitted, invisible, overwritten on replay),
  * between write and marker (same), between marker and checkpoint
  * (marker present, replay skips). IncrementalSpec replays every window.
  *
  * Scale note: one marker per micro-batch is a metadata-scale object
  * store listing (thousands of batches, not billions of rows); batch
  * subdirectories keep append cost O(batch) and let retention compact
  * old batches independently of the log.
  */
object TxnSink {

  private def fileSystem(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitPath(dir: String, batchId: Long) =
    new Path(s"$dir/_txn/commits/$batchId")

  private def batchPath(dir: String, batchId: Long) =
    s"$dir/_txn/batches/$batchId"

  /** Append `df` as batch `batchId` of the store at `dir`, exactly once:
    * skip if committed, else overwrite the batch's own subdirectory and
    * commit the marker. An EMPTY `df` commits nothing at all — a
    * committed-but-row-less batch directory would make [[read]] return
    * Some over paths parquet cannot infer a schema from (the
    * all-committed-batches-empty store must behave exactly like the
    * no-commits store), and skipping is still exactly-once: a replay of
    * the empty batch re-evaluates to empty and skips again. */
  def append(df: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    val fs = fileSystem(spark, dir)
    val marker = commitPath(dir, batchId)
    if (fs.exists(marker)) return // replayed after commit: already visible
    if (df.isEmpty) return // nothing to make visible; see scaladoc
    df.write.mode("overwrite").parquet(batchPath(dir, batchId))
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close() // commit point: batch becomes visible
  }

  /** Batch ids with a commit marker, ascending. */
  def committedIds(spark: SparkSession, dir: String): Seq[Long] = {
    val fs = fileSystem(spark, dir)
    val commits = new Path(s"$dir/_txn/commits")
    if (!fs.exists(commits)) Seq.empty
    else fs.listStatus(commits).toSeq
      .flatMap(s => s.getPath.getName.toLongOption).sorted
  }

  /** The committed rows of ONE batch — None if that batch never
    * committed or holds no data files. The read a LATEST-FRAME store
    * needs: a state snapshot written whole per batch, where a consumer
    * wants the newest committed snapshot rather than the union of all
    * of them ([[StreamingLinkGraph]]'s depth store). */
  def readBatch(spark: SparkSession, dir: String, batchId: Long): Option[DataFrame] = {
    val fs = fileSystem(spark, dir)
    val path = new Path(batchPath(dir, batchId))
    if (!fs.exists(commitPath(dir, batchId)) || !fs.exists(path) ||
        !fs.listStatus(path).exists(_.getPath.getName.endsWith(".parquet"))) None
    else Some(spark.read.parquet(batchPath(dir, batchId)))
  }

  /** The committed rows of the store: exactly the committed batches'
    * subdirectories (uncommitted partials are never listed). Returns
    * None when no batch has committed yet (the caller supplies its own
    * empty frame — parquet cannot read schema from nothing). Committed
    * directories holding no data files — possible in stores written
    * before [[append]] learned to skip empty batches — are filtered out
    * for the same reason. */
  def read(spark: SparkSession, dir: String): Option[DataFrame] = {
    val fs = fileSystem(spark, dir)
    val withData = committedIds(spark, dir)
      .map(batchPath(dir, _))
      .filter { p =>
        val path = new Path(p)
        fs.exists(path) && fs.listStatus(path)
          .exists(_.getPath.getName.endsWith(".parquet"))
      }
    if (withData.isEmpty) None
    else Some(spark.read.parquet(withData: _*))
  }
}
