package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.ext.{Crawl, Graph}

/** Streaming LINK-GRAPH maintenance — the arrival-time twin of the
  * q246/q250 graph tier: pages arrive in micro-batches (a live crawl
  * discovering the web as it fetches), each batch's outlinks are
  * extracted with the batch operator VERBATIM ([[Crawl.linkEdgesFrom]] —
  * no streaming fork to drift) and appended to a [[TxnSink]]-committed
  * edge store, so a checkpoint-loss replay overwrites its own batch
  * subdirectories instead of appending duplicate edges (exactly-once,
  * the q200/q243 store discipline). The BFS horizon is computed FROM the
  * committed store ([[horizon]]).
  *
  * The semantics contract is the MONOTONE LAW: min-depth is monotone
  * under edge ADDITION — a new edge can only create or shorten paths —
  * so the horizon computed after any arrival prefix is an UPPER BOUND
  * of the final one (node-wise: depths only appear and only decrease),
  * and the post-stream horizon equals the batch BFS over the union
  * edge set exactly (IncrementalSpec pins both directions). That law is
  * also what makes the at-scale incremental formulation correct: a
  * production maintainer would not recompute per read but seed a delta
  * frontier at each new edge's source depth + 1 and propagate — pure
  * monotone refinement, the same fixpoint.
  */
object StreamingLinkGraph {

  /** Ingest a parquet documents stream (AvailableNow) into the edge
    * store at `storeDir`; `n` is the corpus size the page synthesis
    * closes the graph against (fixture detail — a real crawl's links
    * are just in the fetched bytes). Returns micro-batches processed. */
  def ingest(spark: SparkSession, docsDir: String, storeDir: String,
             n: Long, queryName: String = "stream_link_graph",
             maxFilesPerTrigger: Option[Int] = None): Int = {
    val schema = spark.read.parquet(docsDir).schema
    val reader = spark.readStream.schema(schema)
    val raw = maxFilesPerTrigger.fold(reader)(m =>
      reader.option("maxFilesPerTrigger", m)).parquet(docsDir)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = raw.writeStream
      .queryName(queryName)
      .option("checkpointLocation", s"$storeDir/_graft_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          batches.incrementAndGet()
          val edges = Crawl.linkEdgesFrom(
            batch.selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "text"), n)
          TxnSink.append(edges, storeDir, batchId)
        }
        ()
      }
      .start()
    q.awaitTermination()
    batches.get()
  }

  /** The committed edge set (empty two-column frame if nothing has
    * committed yet — a horizon over it is just the seeds at depth 0). */
  def edges(spark: SparkSession, storeDir: String): DataFrame =
    TxnSink.read(spark, storeDir).getOrElse {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("src", "dst")
    }

  /** The BFS horizon over the committed store — the batch operator
    * ([[Graph.bfsDepth]]) on exactly-once maintained edges. */
  def horizon(spark: SparkSession, storeDir: String, seeds: DataFrame,
              maxDepth: Int): DataFrame =
    Graph.bfsDepth(edges(spark, storeDir), "src", "dst",
      seeds, "doc_id", maxDepth)
}
