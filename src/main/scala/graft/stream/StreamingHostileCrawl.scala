package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.ext.{Crawl, Warc}

/** Streaming HOSTILE-BYTES crawl ingest — the arrival-time twin of the
  * q229 read path: record-per-member `.warc.gz` blobs with corruption at
  * both resync tiers land as parquet files, each micro-batch walks them
  * with the RECOVERING walk ([[Warc.extractHostile]] — member resync +
  * record resync + body decode) and extracts via the batch chain
  * VERBATIM ([[Crawl.extractFrom]]), per-blob loss columns riding every
  * row — no streaming fork of the recovery logic exists to drift (the
  * [[StreamingCrawl]] shape, one layer of hostility deeper).
  *
  * Semantics contract (IncrementalSpec: streamed ≡ batch): a blob's
  * rows — survivors AND loss accounting — depend only on its own bytes
  * (resync never crosses a blob), so ANY partition of the blob set into
  * micro-batches yields exactly the batch walk of the union,
  * row-for-row, losses included. Corruption arriving in any order is
  * still charged to exactly its own blob.
  *
  * Scale design: per micro-batch cost is the batch walk's (map-side
  * demux, memory O(member)); loss columns make corruption in a live
  * crawl feed an OBSERVABLE stream metric instead of silent data loss. */
object StreamingHostileCrawl {

  /** Extract every surviving page (plus its blob's loss columns) from a
    * parquet hostile-blob stream (AvailableNow); returns the accumulated
    * rows over all micro-batches: the [[Crawl.extractFrom]] columns +
    * skipped_spans/skipped_bytes/skipped_members/skipped_member_bytes. */
  def runToSnapshot(spark: SparkSession, blobsDir: String,
                    maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(blobsDir).schema
    val reader = spark.readStream.schema(schema)
    val raw = maxFilesPerTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n)).parquet(blobsDir)
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    val q = raw.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val blobs = batch
            .selectExpr("CAST(blob_id AS BIGINT) AS blob_id", "warc")
            .as[(Long, Array[Byte])]
          // the loss columns ride the extraction as passthroughs (the
          // batch operator VERBATIM, extra columns untouched);
          // materialize eagerly — foreachBatch frames are only valid
          // within their micro-batch
          sink.add(Crawl.extractFrom(Warc.extractHostile(blobs),
              extra = Seq("skipped_spans", "skipped_bytes",
                "skipped_members", "skipped_member_bytes"))
            .localCheckpoint(true))
        }
        ()
      }
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    sink.asScala.toSeq match {
      case Seq() =>
        import org.apache.spark.sql.types._
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(
            StructField("doc_id", LongType), StructField("http_status", LongType),
            StructField("n_blocks", LongType), StructField("n_kept", LongType),
            StructField("kept_chars", LongType), StructField("total_chars", LongType),
            StructField("boiler_bp", LongType), StructField("extracted", StringType),
            StructField("skipped_spans", LongType), StructField("skipped_bytes", LongType),
            StructField("skipped_members", LongType), StructField("skipped_member_bytes", LongType))))
      case parts => parts.reduce(_ unionByName _)
    }
  }
}
