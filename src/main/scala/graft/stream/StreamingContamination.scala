package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.ext.SuffixArray

/** Streaming contamination audit — the arrival-time twin of
  * [[graft.ext.SuffixArray.auditShard]] (q187): corpus shards land as
  * files, each micro-batch is audited against the PERSISTED benchmark
  * suffix index, and the verdicts append to the report sink. This is the
  * exact deployment shape the incremental audit was built for (index once,
  * audit on ingest), so the streaming layer is `Trigger.AvailableNow` +
  * `foreachBatch` over the batch operator — no streaming fork of the audit
  * logic exists to drift.
  *
  * Semantics contract (IncrementalSpec: streamed ≡ batch): a document's
  * verdict depends only on (its own suffixes, the index) — the
  * [[graft.ext.SuffixArray.auditShard]] independence law — so ANY
  * partitioning of the corpus into micro-batches yields exactly the batch
  * audit of the union, row-for-row. No state, no watermark: the audit is
  * per-document, and the index side is static by design (a benchmark
  * release; rebuilding it is the explicit, rare event).
  *
  * Scale design: per micro-batch cost is the batch operator's —
  * one range shuffle of |batch| + |index|, bounded carries — and batches
  * bound |shard|, so ingest-rate sizing is direct: the audit keeps up as
  * long as (batch interval) > audit(batch size). The index frame is the
  * caller's (read once from parquet, reused across batches).
  */
object StreamingContamination {

  /** Audit a parquet document stream (AvailableNow) against `index`;
    * returns the accumulated per-doc report over all micro-batches.
    * `pruned = true` swaps in [[graft.ext.SuffixArray.auditShardPruned]]
    * (q190) — the shape a mostly-clean ingest wants, since each
    * micro-batch then ships only broadcast-surviving candidate suffixes
    * into its range shuffle; output-identical by the pruned ≡ unpruned
    * law, so the streamed ≡ batch contract is unchanged (IncrementalSpec
    * pins both flavors against the same batch audit). */
  def runToSnapshot(spark: SparkSession, docsDir: String, index: DataFrame,
                    minLen: Int, k: Int = 64,
                    queryName: String = "stream_contamination",
                    maxFilesPerTrigger: Option[Int] = None,
                    pruned: Boolean = false): DataFrame = {
    val schema = spark.read.parquet(docsDir).schema
    val reader = spark.readStream.schema(schema)
    val raw = maxFilesPerTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n)).parquet(docsDir)
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    val q = raw.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          // materialize the batch verdicts eagerly: foreachBatch frames are
          // only valid within their micro-batch
          val audit =
            if (pruned) SuffixArray.auditShardPruned(index, batch, "doc_id",
              "text", minLen, k)
            else SuffixArray.auditShard(index, batch, "doc_id", "text",
              minLen, k)
          sink.add(audit.localCheckpoint(true))
        }
        ()
      }
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    sink.asScala.toSeq match {
      case Seq() =>
        // an all-empty arrival is a legitimate state (an upstream writer
        // committed empty shards) — return the REPORT schema, not the
        // schema-less emptyDataFrame, so filters/unions downstream resolve
        import org.apache.spark.sql.types._
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("doc_id", LongType), StructField("shared_len", LongType),
            StructField("span", StringType), StructField("n_hits", LongType))))
      case parts => parts.reduce(_ unionByName _)
    }
  }
}
