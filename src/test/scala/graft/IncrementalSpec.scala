package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.MergeWrite
import graft.stream.Incremental

/** §2.9: Trigger.AvailableNow incremental ingestion — new files merge into
  * the processed layer; already-seen files are not reprocessed (checkpoint).
  */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** events.ts changed physical type across driver testdata generations
    * (TIMESTAMP(NANOS) → long under nanosAsLong vs TIMESTAMP(MICROS) → NTZ,
    * which approxQuantile rejects). Project to a numeric column and compare
    * in that same domain — only relative order matters for the splits. */
  private def tsNum(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Column =
    if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType) col("ts")
    else unix_micros(col("ts").cast("timestamp"))

  private def tsQuantiles(ev: org.apache.spark.sql.DataFrame, probs: Double*): Array[Double] =
    ev.select(tsNum(ev).cast("double").as("_t")).stat.approxQuantile("_t", probs.toArray, 0.0)

  private def rawFile(url: String, date: String, model: String): String =
    s"""[{"auction_url": "$url",
       |"auction_stats": {"reserve_status": "Reserve", "auction_status": "Sold",
       |  "highest_bid_value": "2,500", "bid_count": 3, "auction_date": "$date",
       |  "bids": ["$$1,000","$$2,500"]},
       |"auction_quick_facts": {"Make": "Ford", "Model": "$model", "Mileage": "45,000",
       |  "VIN": "VINX", "Title Status": "Clean (CA)", "Location": "Dallas, TX",
       |  "Seller": "bob", "Engine": "V8", "Drivetrain": "RWD",
       |  "Transmission": "Manual", "Body Style": "Truck",
       |  "Exterior Color": "Red", "Interior Color": "Black", "Seller Type": "Dealer"}}]""".stripMargin

  test("AvailableNow processes new files only and merges keep-newest") {
    val base = Files.createTempDirectory("graft_stream")
    val rawDir = base.resolve("raw"); Files.createDirectories(rawDir)
    val processed = base.resolve("processed").toString
    val ckpt = base.resolve("ckpt").toString

    Files.writeString(rawDir.resolve("f1.json"),
      rawFile("https://x/auctions/S1/2015-a", "2024-05-01 10:00:00", "first"))
    Incremental.runAvailableNow(spark, rawDir.toString, processed, ckpt)
    val r1 = MergeWrite.readProcessed(spark, processed)
    assert(r1.count() == 1)
    assert(r1.head().getAs[String]("model") == "first")

    // late correction for the same auction (newer ts) + a brand-new auction
    Files.writeString(rawDir.resolve("f2.json"),
      rawFile("https://x/auctions/S1/2015-a", "2024-05-01 11:00:00", "corrected"))
    Files.writeString(rawDir.resolve("f3.json"),
      rawFile("https://x/auctions/S2/2016-b", "2024-05-02 09:00:00", "other"))
    Incremental.runAvailableNow(spark, rawDir.toString, processed, ckpt)
    val r2 = MergeWrite.readProcessed(spark, processed)
    assert(r2.count() == 2)
    assert(r2.filter(col("auction_id") === "S1").head().getAs[String]("model") == "corrected")
  }

  test("AvailableNow end-to-end: micro-batches reach the star warehouse idempotently") {
    val base = Files.createTempDirectory("graft_stream_e2e")
    val rawDir = base.resolve("raw"); Files.createDirectories(rawDir)
    val processed = base.resolve("processed").toString
    val ckpt = base.resolve("ckpt").toString
    val whDir = base.resolve("wh").toString

    Files.writeString(rawDir.resolve("f1.json"),
      rawFile("https://x/auctions/S1/2015-a", "2024-05-01 10:00:00", "first"))
    Incremental.runAvailableNow(spark, rawDir.toString, processed, ckpt, Some(whDir))
    val wh = new graft.star.Warehouse(spark, whDir)
    assert(wh.read("auction_fact").count() == 1)

    // correction for S1 (newer ts) + a brand-new auction, second micro-batch:
    // fact stays insert-only (S1 not duplicated), S2 appended, vehicle dim
    // upserts by (vin, auction_id)
    Files.writeString(rawDir.resolve("f2.json"),
      rawFile("https://x/auctions/S1/2015-a", "2024-05-01 11:00:00", "corrected"))
    Files.writeString(rawDir.resolve("f3.json"),
      rawFile("https://x/auctions/S2/2016-b", "2024-05-02 09:00:00", "other"))
    Incremental.runAvailableNow(spark, rawDir.toString, processed, ckpt, Some(whDir))
    val fact = wh.read("auction_fact")
    assert(fact.count() == 2)
    assert(fact.select("auction_id").distinct().count() == 2)
    assert(wh.read("vehicle_dim").count() == 2)
    // the processed layer still merged the correction
    assert(MergeWrite.readProcessed(spark, processed)
      .filter(col("auction_id") === "S1").head().getAs[String]("model") == "corrected")
  }

  test("stateful streaming sessionization matches batch q41") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("graft_sess_stream")
    Files.createSymbolicLink(streamDir.resolve("events.parquet"),
      Paths.get(s"$dir/events.parquet"))
    val streaming = graft.stream.Sessionize
      .runToSnapshot(spark, streamDir.toString, "sess_test")
      .toDF()
      .select(col("user_id"), col("session_id"), col("n_events"),
        unix_millis(col("session_start")).as("s"), unix_millis(col("session_end")).as("e"))
      .orderBy("user_id", "session_id").collect().toSeq
    val batch = graft.queries.AdvancedJoinQueries.q41Sessionize(spark, dir)
      .select(col("user_id"), col("session_id"), col("n_events"),
        unix_millis(col("session_start").cast("timestamp")).as("s"),
        unix_millis(col("session_end").cast("timestamp")).as("e"))
      .collect().toSeq
    assert(streaming == batch)
  }

  test("runToWarehouse upserts sessions into a caller-owned bucketed table") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("graft_sess_wh_stream")
    Files.createSymbolicLink(streamDir.resolve("events.parquet"),
      Paths.get(s"$dir/events.parquet"))
    val whDir = Files.createTempDirectory("graft_sess_wh").toString
    val wh = new graft.star.Warehouse(spark, whDir)
    graft.stream.Sessionize.runToWarehouse(spark, streamDir.toString, wh,
      table = "sessions", queryName = "sess_wh")
    val table = wh.read("sessions")
    // on-disk layout is the keyed-upsert shape: hash-bucket partition dirs
    val bucketDirs = new java.io.File(s"$whDir/sessions").listFiles()
      .filter(_.getName.startsWith("_bucket=")).map(_.getName)
    assert(bucketDirs.nonEmpty)
    // the table IS the snapshot: matches the oracle-checked batch twin
    val streamed = table
      .select(col("user_id"), col("session_id"), col("n_events"),
        unix_millis(col("session_start")).as("s"), unix_millis(col("session_end")).as("e"))
      .orderBy("user_id", "session_id").collect().toSeq
    val batch = graft.queries.AdvancedJoinQueries.q41Sessionize(spark, dir)
      .select(col("user_id"), col("session_id"), col("n_events"),
        unix_millis(col("session_start").cast("timestamp")).as("s"),
        unix_millis(col("session_end").cast("timestamp")).as("e"))
      .collect().toSeq
    assert(streamed == batch)
  }

  test("multi-batch sessionization (1 file per trigger) still matches batch q41") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("graft_sess_multi")
    // split events into three time-contiguous files, oldest first, so each
    // micro-batch extends sessions from the previous ones — this exercises
    // cross-batch state merging AND the snapshot upsert (stale open-session
    // rows must be replaced, not retained)
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val Array(q33, q66) = tsQuantiles(ev, 0.33, 0.66)
    val chunks = Seq(
      ev.filter(tsNum(ev) <= q33),
      ev.filter(tsNum(ev) > q33 && tsNum(ev) <= q66),
      ev.filter(tsNum(ev) > q66))
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val tmp = Files.createTempDirectory(s"graft_sess_chunk$i")
      chunk.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      val dest = streamDir.resolve(s"c$i.parquet")
      Files.move(part, dest)
      dest.toFile.setLastModified(1000000L * (i + 1)) // force processing order
    }
    val streaming = graft.stream.Sessionize
      .runToSnapshot(spark, streamDir.toString, "sess_multi", maxFilesPerTrigger = Some(1))
      .toDF()
      .select(col("user_id"), col("session_id"), col("n_events"),
        unix_millis(col("session_start")).as("s"), unix_millis(col("session_end")).as("e"))
      .orderBy("user_id", "session_id").collect().toSeq
    val batch = graft.queries.AdvancedJoinQueries.q41Sessionize(spark, dir)
      .select(col("user_id"), col("session_id"), col("n_events"),
        unix_millis(col("session_start").cast("timestamp")).as("s"),
        unix_millis(col("session_end").cast("timestamp")).as("e"))
      .collect().toSeq
    assert(streaming == batch)
  }

  test("out-of-order micro-batches conserve every event (stragglers become closed sessions)") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("graft_sess_ooo")
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val total = ev.count()
    val Array(q50) = tsQuantiles(ev, 0.5)
    // NEWEST half first, oldest second — every old event arrives after the
    // open sessions have moved far past it
    val chunks = Seq(ev.filter(tsNum(ev) > q50), ev.filter(tsNum(ev) <= q50))
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val tmp = Files.createTempDirectory(s"graft_ooo_chunk$i")
      chunk.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      val dest = streamDir.resolve(s"c$i.parquet")
      Files.move(part, dest)
      dest.toFile.setLastModified(1000000L * (i + 1))
    }
    val sessions = graft.stream.Sessionize
      .runToSnapshot(spark, streamDir.toString, "sess_ooo", maxFilesPerTrigger = Some(1))
    // ids diverge from the batch twin (stragglers take fresh ids — by
    // design), but no event is lost, double-counted, or silently folded
    assert(sessions.toDF().agg(sum(col("n_events"))).head().getLong(0) == total)
    assert(sessions.toDF().select("user_id", "session_id").distinct().count() ==
      sessions.count())
  }

  test("stateful streaming running totals match batch q65 across ordered micro-batches") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("graft_tot_stream")
    // two event-time-ordered chunks: every user's later events arrive in the
    // later batch → state must carry (rn, cents) across the batch boundary
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val Array(q50) = tsQuantiles(ev, 0.5)
    val chunks = Seq(ev.filter(tsNum(ev) <= q50), ev.filter(tsNum(ev) > q50))
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val tmp = Files.createTempDirectory(s"graft_tot_chunk$i")
      chunk.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      val dest = streamDir.resolve(s"c$i.parquet")
      Files.move(part, dest)
      dest.toFile.setLastModified(1000000L * (i + 1))
    }
    val streamed = graft.stream.RunningTotals
      .runToSnapshot(spark, streamDir.toString, "tot_test", maxFilesPerTrigger = Some(1))
      .toDF().select("event_id", "user_id", "rn", "cum_sum")
      .orderBy("event_id").collect().toSeq
    val batch = graft.ext.TimeSeries
      .movingStats(graft.util.Tables.load(spark, dir, "events"),
        "user_id", "ts", "event_id", "value")
      .select("event_id", "user_id", "rn", "cum_sum")
      .orderBy("event_id").collect().toSeq
    assert(streamed.size == batch.size)
    assert(streamed == batch)
  }

  test("streaming dedup across micro-batches keeps one row per fingerprint") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("graft_dedup_stream")
    // two overlapping files: docs 250-299 arrive in BOTH batches — the
    // second arrival must be suppressed by the watermark-bounded state
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val parts = Seq(docs.filter(col("doc_id") < 300), docs.filter(col("doc_id") >= 250))
    parts.zipWithIndex.foreach { case (chunk, i) =>
      val tmp = Files.createTempDirectory(s"graft_dedup_chunk$i")
      chunk.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      val dest = streamDir.resolve(s"c$i.parquet")
      Files.move(part, dest)
      dest.toFile.setLastModified(1000000L * (i + 1))
    }
    val streamed = graft.stream.StreamingDedup
      .runToSnapshot(spark, streamDir.toString, "dedup_test", maxFilesPerTrigger = Some(1))
    val batchFps = graft.ext.Dedup.exactDupGroups(docs, "doc_id", "text")
      .select("fingerprint").collect().map(_.getString(0)).toSet
    assert(streamed.select("fingerprint").collect().map(_.getString(0)).toSet == batchFps)
    // exactly one emission per fingerprint, despite the overlap
    assert(streamed.count() == batchFps.size)
  }

  test("streaming near-dup ingest equals batch cross-corpus LSH across micro-batches") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("graft_neardup_stream")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // three disjoint crawl batches; each later batch must pair ONLY against
    // the union of earlier ones (the batch operator's cross-corpus contract)
    val cuts = Seq(col("doc_id") < 200,
      col("doc_id") >= 200 && col("doc_id") < 350,
      col("doc_id") >= 350)
    cuts.zipWithIndex.foreach { case (cut, i) =>
      val tmp = Files.createTempDirectory(s"graft_neardup_chunk$i")
      docs.filter(cut).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      val dest = streamDir.resolve(s"c$i.parquet")
      Files.move(part, dest)
      dest.toFile.setLastModified(1000000L * (i + 1))
    }
    val streamed = graft.stream.StreamingNearDup
      .runToSnapshot(spark, streamDir.toString, "neardup_test",
        maxFilesPerTrigger = Some(1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def sig(cut: org.apache.spark.sql.Column) =
      graft.ext.Dedup.minhashSignature(docs.filter(cut), "doc_id", "text")
    val expected = (1 until cuts.size).flatMap { i =>
      graft.ext.Dedup.crossCorpusCandidates(
          sig(cuts(i)), sig(cuts.take(i).reduce(_ || _)), "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }.toSet
    assert(expected.nonEmpty) // fixture must actually exercise cross-batch pairs
    assert(streamed == expected)
  }

  test("streaming paragraph dedup equals the batch block keeper across " +
       "micro-batches under id-ordered arrival") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("graft_paradedup_stream")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // id-ordered micro-batches: the ingest contract under which keep-first
    // arrival IS the batch global min(struct(doc, position)) keeper
    val cuts = Seq(col("doc_id") < 200,
      col("doc_id") >= 200 && col("doc_id") < 350,
      col("doc_id") >= 350)
    cuts.zipWithIndex.foreach { case (cut, i) =>
      val tmp = Files.createTempDirectory(s"graft_paradedup_chunk$i")
      docs.filter(cut).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      val dest = streamDir.resolve(s"c$i.parquet")
      Files.move(part, dest)
      dest.toFile.setLastModified(1000000L * (i + 1))
    }
    val streamed = graft.stream.StreamingParagraphDedup
      .runToSnapshot(spark, streamDir.toString, "paradedup_test",
        maxFilesPerTrigger = Some(1))
      .collect().map(_.toString).sorted.toSeq
    val batch = graft.ext.Dedup
      .paragraphDedup(docs, "doc_id", "text", blockWords = 20)
      .collect().map(_.toString).sorted.toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch,
      "streamed keep-first must equal the batch keeper verdict-for-verdict")
  }

  test("streaming paragraph dedup on an OUT-OF-ORDER arrival keeps the " +
       "first-arrival keeper — never two kept rows per block hash") {
    // ADVICE r14: under the old rule a later batch carrying a smaller
    // (doc, bi) for a seen block ADOPTED the newcomer as keeper, emitting
    // a second kept=true row for the same hash (append mode cannot retract
    // the first). Pin the fixed invariant with a descending two-file
    // stream: doc 500 (batch 1) and doc 10 (batch 2) share their one block.
    import spark.implicits._
    val streamDir = Files.createTempDirectory("graft_paradedup_ooo")
    val words = (1 to 20).map(i => s"w$i").mkString(" ")
    val batches = Seq(Seq((500L, words)), Seq((10L, words)))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = Files.createTempDirectory(s"graft_paradedup_ooo_chunk$i")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      val dest = streamDir.resolve(s"c$i.parquet")
      Files.move(part, dest)
      dest.toFile.setLastModified(1000000L * (i + 1))
    }
    graft.stream.StreamingParagraphDedup
      .runToSnapshot(spark, streamDir.toString, "paradedup_ooo",
        maxFilesPerTrigger = Some(1))
    val marked = spark.table("paradedup_ooo")
    assert(marked.count() == 2)
    val kept = marked.filter(col("_kept")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(500L),
      s"expected the first-arrival keeper (doc 500) as the ONLY kept row, got $kept")
  }

  test("streaming contamination audit equals the batch shard audit over " +
       "the union of micro-batches (the q187 independence law, streamed)") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val index = graft.ext.SuffixArray.contaminationIndex(
      docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", k = 64)
      .localCheckpoint(true)
    val shard = docs.filter(col("doc_id") % 5 === 1)
    // three arrival files in arbitrary id order
    val streamDir = Files.createTempDirectory("graft_contam_stream")
    val cuts = Seq(col("doc_id") % 3 === 0, col("doc_id") % 3 === 1,
      col("doc_id") % 3 === 2)
    cuts.zipWithIndex.foreach { case (cut, i) =>
      val tmp = Files.createTempDirectory(s"graft_contam_chunk$i")
      shard.filter(cut).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.move(part, streamDir.resolve(s"c$i.parquet"))
    }
    val streamed = graft.stream.StreamingContamination
      .runToSnapshot(spark, streamDir.toString, index, minLen = 20,
        maxFilesPerTrigger = Some(1))
      .collect().map(_.toString).sorted.toSeq
    val batch = graft.ext.SuffixArray.auditShard(index, shard,
        "doc_id", "text", minLen = 20, k = 64)
      .collect().map(_.toString).sorted.toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch,
      "per-batch audits must union to the batch audit exactly")
    // the pruned flavor (q190 per micro-batch) is output-identical — the
    // pruned ≡ unpruned law composed with the same independence argument
    val streamedPruned = graft.stream.StreamingContamination
      .runToSnapshot(spark, streamDir.toString, index, minLen = 20,
        maxFilesPerTrigger = Some(1), pruned = true)
      .collect().map(_.toString).sorted.toSeq
    assert(streamedPruned == batch,
      "pruned per-batch audits must union to the same batch audit")
  }

  test("streaming HOSTILE crawl ingest equals the batch walk+extraction " +
       "over the union of micro-batches — losses included (r18)") {
    val dir = "/root/testdata/sf0.001"
    val blobs = graft.queries.WebQueries.hostileCrawlBlobs(spark, dir)
      .toDF("blob_id", "warc").localCheckpoint(true)
    // three arrival files — the law holds for ANY partitioning, and
    // corruption arriving in any order is charged to exactly its blob
    val streamDir = Files.createTempDirectory("graft_hostile_stream")
    Seq(col("blob_id") % 3 === 0, col("blob_id") % 3 === 1,
        col("blob_id") % 3 === 2).zipWithIndex.foreach { case (cut, i) =>
      val tmp = Files.createTempDirectory(s"graft_hostile_chunk$i")
      blobs.filter(cut).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.move(part, streamDir.resolve(s"c$i.parquet"))
    }
    val streamed = graft.stream.StreamingHostileCrawl
      .runToSnapshot(spark, streamDir.toString, maxFilesPerTrigger = Some(1))
      .collect().map(_.toString).sorted.toSeq
    import spark.implicits._
    val batch = graft.ext.Crawl.extractFrom(
        graft.ext.Warc.extractHostile(blobs.as[(Long, Array[Byte])]),
        extra = Seq("skipped_spans", "skipped_bytes", "skipped_members",
          "skipped_member_bytes"))
      .collect().map(_.toString).sorted.toSeq
    assert(batch.size > 300, s"non-vacuity: got ${batch.size}")
    // the fixture must actually plant loss on this SF, or the law is
    // vacuous on the columns that matter
    assert(batch.exists(_.contains("64")), "no member loss in fixture")
    assert(streamed == batch,
      "per-batch hostile walks must union to the batch walk exactly, " +
        "loss columns included")
  }

  test("streaming crawl ingest equals the batch q208 chain over the union " +
       "of micro-batches (per-page independence, streamed)") {
    val dir = "/root/testdata/sf0.001"
    val blobs = graft.queries.WebQueries.crawlBlobs(spark, dir)
      .toDF("blob_id", "warc")
    // three arrival files — the law holds for ANY partitioning
    val streamDir = Files.createTempDirectory("graft_crawl_stream")
    (0 until 3).foreach { i =>
      val tmp = Files.createTempDirectory(s"graft_crawl_chunk$i")
      blobs.filter(col("blob_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.move(part, streamDir.resolve(s"c$i.parquet"))
    }
    val streamed = graft.stream.StreamingCrawl
      .runToSnapshot(spark, streamDir.toString, maxFilesPerTrigger = Some(1))
      .collect().map(_.toString).sorted.toSeq
    import spark.implicits._
    val batch = graft.ext.Crawl.extract(
        blobs.as[(Long, Array[Byte])])
      .collect().map(_.toString).sorted.toSeq
    assert(batch.size > 400, s"non-vacuity: expected the 200-page mass, got ${batch.size}")
    assert(streamed == batch,
      "per-batch extractions must union to the batch chain exactly")
  }

  test("streaming archive write equals the batch q243 release at the " +
       "RECORD level for any batching, and crash replay never doubles (r19)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val blobs = graft.queries.WebQueries.crawlBlobs(spark, dir)
      .toDF("blob_id", "warc")
    // three arrival files — blob GROUPING differs per batching, which is
    // why the law is record-level (seek-reproduced doc_id/mass/md5)
    val streamDir = Files.createTempDirectory("graft_arch_stream")
    (0 until 3).foreach { i =>
      val tmp = Files.createTempDirectory(s"graft_arch_chunk$i")
      blobs.filter(col("blob_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.move(part, streamDir.resolve(s"c$i.parquet"))
    }
    val releaseDir = Files.createTempDirectory("graft_arch_release").toString
    assert(graft.stream.StreamingArchiveWrite.ingest(
      spark, streamDir.toString, releaseDir, maxFilesPerTrigger = Some(1)) == 3)
    val streamed = graft.stream.StreamingArchiveWrite
      .releaseRecords(spark, releaseDir)
      .as[(Long, Long, String)].collect().sorted.toSeq
    val batch = graft.queries.WebQueries.q243ArchiveWrite(spark, dir)
      .select(col("doc_id"), col("body_bytes"), col("body_md5"))
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(batch.size > 40, s"non-vacuity: expected the curated mass, got ${batch.size}")
    assert(streamed == batch,
      "seeking every committed sidecar extent must reproduce the batch release")
    // crash window: checkpoint loss redelivers EVERY batch; the txn log
    // must swallow the replay (same batch ids → same subdirectories)
    val fs = new org.apache.hadoop.fs.Path(releaseDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$releaseDir/_graft_checkpoint"), true)
    assert(graft.stream.StreamingArchiveWrite.ingest(
      spark, streamDir.toString, releaseDir, maxFilesPerTrigger = Some(1)) == 3,
      "full redelivery expected")
    val replayed = graft.stream.StreamingArchiveWrite
      .releaseRecords(spark, releaseDir)
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(replayed == batch,
      "replayed batches must overwrite their own output, never append a second copy")
  }

  test("streaming near-dup vs the persisted band index: per-batch audits " +
       "+ appends fold to the one-shot batch audit of the union (r16)") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val shard = docs.filter(col("doc_id") % 2 === 1)
    // the standing index, built once; the stream will APPEND to it
    val ixDir = Files.createTempDirectory("graft_sndix").toString
    graft.ext.Dedup.nearDupBandIndex(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(ixDir)
    // three disjoint arrival files — the law holds for ANY partitioning
    val streamDir = Files.createTempDirectory("graft_snd_stream")
    Seq(col("doc_id") % 3 === 0, col("doc_id") % 3 === 1,
        col("doc_id") % 3 === 2).zipWithIndex.foreach { case (cut, i) =>
      val tmp = Files.createTempDirectory(s"graft_snd_chunk$i")
      shard.filter(cut).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.move(part, streamDir.resolve(s"c$i.parquet"))
    }
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        (math.min(a, b), math.max(a, b))
      }.toSet
    val streamed = canon(graft.stream.StreamingNearDupIndex
      .runToSnapshot(spark, streamDir.toString, ixDir,
        maxFilesPerTrigger = Some(1)))
    // one-shot batch audit of the union, against the ORIGINAL index (the
    // stream mutated its copy, so rebuild for the reference side)
    val ixDir2 = Files.createTempDirectory("graft_sndix2").toString
    graft.ext.Dedup.nearDupBandIndex(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(ixDir2)
    val batch = canon(graft.ext.Dedup.nearDupAgainstIndex(
      spark.read.parquet(ixDir2), shard, "doc_id", "text"))
    assert(batch.nonEmpty, "law ran on empty pair structure")
    assert(streamed == batch,
      s"fold diverged: streamed-only=${(streamed -- batch).take(5)} " +
        s"batch-only=${(batch -- streamed).take(5)}")
    // cross-ARRIVAL pairs must exist, or the append path went untested
    // (a pair between docs of different %3 classes can only surface via
    // a later batch pairing against an earlier batch's appended bands
    // or the within-batch self-join — assert the index actually grew)
    val finalIx = graft.stream.StreamingNearDupIndex.readIndex(spark, ixDir).count()
    val ix0 = spark.read.parquet(ixDir2).count()
    assert(finalIx > ix0, "stream never appended to the index")
    assert(streamed.exists { case (a, b) =>
      a % 2 == 1 && b % 2 == 1 && a % 3 != b % 3 },
      "no pair spans two arrival files — the append path went unexercised")
  }

  test("streaming redirect ingest: the persisted meta store resolves to " +
       "the batch chain for any arrival partitioning, and a re-invocation " +
       "after new files appends ONLY the new metadata (r17)") {
    import graft.ext.{Redirects, Warc}
    import graft.stream.StreamingRedirects
    val dir = "/root/testdata/sf0.001"
    val blobs = graft.queries.WebQueries.redirectBlobs(spark, dir)
      .toDF("blob_id", "warc").localCheckpoint(true)
    val streamDir = Files.createTempDirectory("graft_redir_stream")
    def land(i: Int): Unit = {
      val tmp = Files.createTempDirectory(s"graft_redir_chunk$i")
      blobs.filter(col("blob_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.move(part, streamDir.resolve(s"c$i.parquet"))
    }
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("orig", "final_uri", "final_status", "hops")
        .collect().map(_.toString).sorted.toSeq
    val metaDir = Files.createTempDirectory("graft_redir_meta").toString
    // wave 1: two arrival files
    land(0); land(1)
    assert(StreamingRedirects.ingest(spark, streamDir.toString, metaDir,
      maxFilesPerTrigger = Some(1)) == 2)
    import spark.implicits._
    val wave1 = blobs.filter(col("blob_id") % 3 =!= 2)
      .as[(Long, Array[Byte])]
    assert(canon(StreamingRedirects.resolveFromStore(spark, metaDir)) ==
      canon(Redirects.resolve(Warc.extractHttpMeta(wave1))),
      "partial store must resolve exactly as the batch over the same blobs")
    // wave 2 lands; re-invoke — the durable checkpoint must process ONLY
    // the new file (a duplicate-append would double every meta row)
    land(2)
    assert(StreamingRedirects.ingest(spark, streamDir.toString, metaDir,
      maxFilesPerTrigger = Some(1)) == 1)
    val all = blobs.as[(Long, Array[Byte])]
    val batchMeta = Warc.extractHttpMeta(all).localCheckpoint(true)
    assert(StreamingRedirects.storeRows(spark, metaDir).count() == batchMeta.count(),
      "store row count must equal the one-shot demux — no duplicate appends")
    val streamed = canon(StreamingRedirects.resolveFromStore(spark, metaDir))
    val batch = canon(Redirects.resolve(batchMeta))
    assert(batch.size > 400, s"non-vacuity: got ${batch.size}")
    assert(streamed == batch,
      "full store must resolve exactly as the one-shot batch chain")
    // CRASH REPLAY (r18, the exactly-once law end-to-end): lose the
    // streaming checkpoint entirely — the worst redelivery case, every
    // batch replays from scratch under whatever id assignment the second
    // run picks — and the COMMITTED store must still equal the one-shot
    // demux row-for-row: idempotent per-batch overwrites absorb the
    // replay, a plain append would double every row
    def deleteRec(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).toArray.map(_.asInstanceOf[java.nio.file.Path])
          .foreach(deleteRec)
      Files.delete(p)
    }
    deleteRec(java.nio.file.Paths.get(s"$metaDir/_graft_checkpoint"))
    assert(StreamingRedirects.ingest(spark, streamDir.toString, metaDir,
      maxFilesPerTrigger = Some(1)) == 3, "full redelivery expected")
    assert(StreamingRedirects.storeRows(spark, metaDir).count() == batchMeta.count(),
      "replayed batches must overwrite their own output, never append a second copy")
    assert(canon(StreamingRedirects.resolveFromStore(spark, metaDir)) == batch,
      "post-replay store must still resolve exactly as the batch chain")
  }

  test("TxnSink crash windows: replay after data-write-before-commit " +
       "overwrites, replay after commit skips, partials stay invisible (r18)") {
    import graft.stream.TxnSink
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_txn").toString
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    // window 1: crash BETWEEN data write and commit marker — the data
    // subdirectory exists but the batch must be invisible to readers
    b0.write.mode("overwrite").parquet(s"$dir/_txn/batches/0")
    assert(TxnSink.read(spark, dir).isEmpty, "uncommitted batch leaked")
    // redelivery completes the batch: exactly one copy visible
    TxnSink.append(b0, dir, 0L)
    assert(TxnSink.read(spark, dir).get.count() == 2)
    // window 2: crash AFTER commit, BEFORE checkpoint — redelivery of the
    // same id must skip (fast path), never double
    TxnSink.append(b0, dir, 0L)
    assert(TxnSink.read(spark, dir).get.count() == 2)
    // window 3: mid-write crash left a PARTIAL subdirectory for batch 1;
    // redelivery overwrites it wholesale
    Seq((9L, "junk")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/_txn/batches/1")
    val b1 = Seq((3L, "c")).toDF("id", "v")
    TxnSink.append(b1, dir, 1L)
    val rows = TxnSink.read(spark, dir).get.as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "a"), (2L, "b"), (3L, "c")),
      s"partial write survived the replay: $rows")
    assert(TxnSink.committedIds(spark, dir) == Seq(0L, 1L))
  }

  test("TxnSink empty batches: an all-empty store reads as None (never a " +
       "schema-less parquet throw), empty appends skip, data still lands (r19)") {
    import graft.stream.TxnSink
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_txn_empty").toString
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    // every committed batch empty (e.g. first micro-batch demuxes to
    // zero rows): must behave exactly like the no-commits store
    TxnSink.append(empty, dir, 0L)
    TxnSink.append(empty, dir, 1L)
    assert(TxnSink.read(spark, dir).isEmpty,
      "all-empty store must read as None, not throw on schema inference")
    // a later real batch commits normally; the store becomes visible
    TxnSink.append(Seq((1L, "a")).toDF("id", "v"), dir, 2L)
    assert(TxnSink.read(spark, dir).get.count() == 1)
    // replay of an empty batch after the real one: still skipped, no-op
    TxnSink.append(empty, dir, 1L)
    assert(TxnSink.read(spark, dir).get.count() == 1)
    // a pre-fix store shape: committed marker whose directory has no
    // data files — read filters it out instead of throwing
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/_txn/batches/3"))
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/_txn/commits/3"), true).close()
    assert(TxnSink.read(spark, dir).get.count() == 1,
      "a data-less committed directory must be filtered, not read")
  }

  test("StreamingRedirects store migration: rows appended by the " +
       "pre-TxnSink release at the store root stay visible (r19)") {
    import graft.stream.{StreamingRedirects, TxnSink}
    import spark.implicits._
    val metaDir = Files.createTempDirectory("graft_redir_migrate").toString
    val legacy = Seq(("u1", 301L, Some("u2")), ("u2", 200L, None: Option[String]))
      .toDF("uri", "http_status", "location")
    // the previous release's plain mode(append) writes land at the root
    legacy.write.mode("append").parquet(metaDir)
    // pre-migration store with no committed batches: still readable
    assert(StreamingRedirects.storeRows(spark, metaDir).count() == 2,
      "root-level pre-TxnSink rows must not become invisible")
    // post-migration appends go through the txn log; both unioned
    TxnSink.append(Seq(("u3", 200L, None: Option[String]))
      .toDF("uri", "http_status", "location"), metaDir, 0L)
    assert(StreamingRedirects.storeRows(spark, metaDir).count() == 3)
    // and resolution sees the union: u1 → u2 (200) through the legacy edge
    val landed = StreamingRedirects.resolveFromStore(spark, metaDir)
      .filter(col("orig") === "u1")
      .select("final_uri").as[String].collect().head
    assert(landed == "u2")
  }

  test("redirect resolution is NON-monotone in edge arrival: a later hop " +
       "rewrites an earlier URL's landing (why the twin resolves on read)") {
    import graft.ext.Redirects
    import spark.implicits._
    val early = Seq(("u1", 301L, Some("u2"))).toDF("uri", "http_status", "location")
    val late = early.unionByName(Seq(
      ("u2", 301L, Some("u3")), ("u3", 200L, None: Option[String]))
      .toDF("uri", "http_status", "location"))
    val r1 = Redirects.resolve(early)
      .filter(col("orig") === "u1")
      .select("final_uri", "final_status", "hops")
      .as[(String, Option[Long], Long)].collect().head
    val r2 = Redirects.resolve(late)
      .filter(col("orig") === "u1")
      .select("final_uri", "final_status", "hops")
      .as[(String, Option[Long], Long)].collect().head
    assert(r1 == (("u2", None, 1L))) // dangles: u2 not crawled yet
    assert(r2 == (("u3", Some(200L), 2L))) // REWRITTEN by u2's later 301
  }

  test("streaming HLL registers equal the batch rollup across micro-batches") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("graft_hll_stream")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    // three disjoint ingest batches; max-merge must fold them to the same
    // registers as one batch pass over the union
    val cuts = Seq(col("l_orderkey") % 3 === 0,
      col("l_orderkey") % 3 === 1, col("l_orderkey") % 3 === 2)
    cuts.zipWithIndex.foreach { case (cut, i) =>
      val tmp = Files.createTempDirectory(s"graft_hll_chunk$i")
      li.filter(cut).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.move(part, streamDir.resolve(s"c$i.parquet"))
    }
    val streamed = graft.stream.StreamingHll
      .runToSnapshot(spark, streamDir.toString, "l_returnflag", "l_partkey",
        "hll_test", maxFilesPerTrigger = Some(1))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.ext.Sketch.hllRollup(li, "l_returnflag", "l_partkey")
      .select(col("scope"), col("n_zero_registers"), col("hll_estimate"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("streaming windowed counts match the batch tumbling-window query") {
    val dir = "/root/testdata/sf0.001"
    // file-stream sources need a directory; link the single-file table in
    val streamDir = Files.createTempDirectory("graft_events_stream")
    Files.createSymbolicLink(streamDir.resolve("events.parquet"),
      Paths.get(s"$dir/events.parquet"))
    val streaming = graft.stream.WindowedCounts
      .runToSnapshot(spark, streamDir.toString, "wc_test")
      .select(col("bucket").cast("timestamp_ntz").as("bucket"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("bucket", "event_type").collect().toSeq
    val batch = graft.queries.ExprQueries.q19TumblingWindow(spark, dir)
      .collect().toSeq
    assert(streaming == batch)
  }

  test("multi-batch windowed counts (1 file per trigger) still match batch q19") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("graft_events_multi")
    // time-contiguous files, oldest first: complete-mode state must carry
    // partial windows across micro-batches without the watermark dropping them
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val Array(mid) = tsQuantiles(ev, 0.5)
    Seq(ev.filter(tsNum(ev) <= mid), ev.filter(tsNum(ev) > mid)).zipWithIndex.foreach {
      case (chunk, i) =>
        val tmp = Files.createTempDirectory(s"graft_wc_chunk$i")
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
          .find(_.toString.endsWith(".parquet")).get
        val dest = streamDir.resolve(s"c$i.parquet")
        Files.move(part, dest)
        dest.toFile.setLastModified(1000000L * (i + 1))
    }
    val streaming = graft.stream.WindowedCounts
      .runToSnapshot(spark, streamDir.toString, "wc_multi", maxFilesPerTrigger = Some(1))
      .select(col("bucket").cast("timestamp_ntz").as("bucket"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("bucket", "event_type").collect().toSeq
    val batch = graft.queries.ExprQueries.q19TumblingWindow(spark, dir)
      .collect().toSeq
    assert(streaming == batch)
  }

  test("stream-stream interval join matches the batch range join across batch boundaries") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("graft_ij_stream")
    // event-time-ordered halves: (view, purchase) pairs straddling the split
    // can only match through the two-sided join state carried across batches
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val Array(q50) = tsQuantiles(ev, 0.5)
    val chunks = Seq(ev.filter(tsNum(ev) <= q50), ev.filter(tsNum(ev) > q50))
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val tmp = Files.createTempDirectory(s"graft_ij_chunk$i")
      chunk.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      val dest = streamDir.resolve(s"c$i.parquet")
      Files.move(part, dest)
      dest.toFile.setLastModified(1000000L * (i + 1))
    }
    val streamed = graft.stream.IntervalJoin
      .runToSnapshot(spark, streamDir.toString, "ij_test", windowMinutes = 1440,
        maxFilesPerTrigger = Some(1))
      .select("view_id", "purchase_id").orderBy("view_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch = graft.stream.IntervalJoin
      .batchEquivalent(graft.util.Tables.load(spark, dir, "events"), 1440)
      .select("view_id", "purchase_id").orderBy("view_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(batch.nonEmpty, "fixture must produce at least one attributed pair")
    assert(streamed == batch)
    // pairs straddle the split (otherwise this proves nothing about state)
    // q50 is in tsNum's domain: raw long (nanos) when ts is LongType, else
    // unix_micros; loaded timestamps cast to epoch seconds — align units
    val q50s =
      if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType) q50 / 1e9
      else q50 / 1e6
    val crossing = graft.stream.IntervalJoin
      .batchEquivalent(graft.util.Tables.load(spark, dir, "events"), 1440)
      .filter(col("view_ts").cast("timestamp").cast("double") <= q50s &&
        col("purchase_ts").cast("timestamp").cast("double") > q50s)
    assert(crossing.count() > 0, "no cross-batch pairs — split point needs adjusting")
  }

  test("streaming SCD2 merge across micro-batches equals the batch replay") {
    import spark.implicits._
    val attrs = Seq("seg", "nat")
    val streamDir = Files.createTempDirectory("graft_scd2_stream")
    val stateDir = Files.createTempDirectory("graft_scd2_root").resolve("state").toString
    val ckpt = Files.createTempDirectory("graft_scd2_ckpt").toString
    // batch 1 load; batch 2: change + unchanged + new key; batch 3: reversion
    val batches = Seq(
      Seq((1L, "A", 10), (2L, "B", 20), (3L, "C", 30)),
      Seq((1L, "A2", 10), (2L, "B", 20), (9L, "N", 90)),
      Seq((1L, "A", 10))).map(_.toDF("k", "seg", "nat"))
    batches.zipWithIndex.foreach { case (b, i) =>
      val tmp = Files.createTempDirectory(s"graft_scd2_b$i")
      b.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      val dest = streamDir.resolve(s"b$i.parquet")
      Files.move(part, dest)
      dest.toFile.setLastModified(1000000L * (i + 1))
    }
    graft.stream.Scd2Stream.runAvailableNow(spark, streamDir.toString,
      batches.head.schema, stateDir, ckpt, "k", attrs, maxFilesPerTrigger = Some(1))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("k", "seg", "nat", "valid_from", "valid_to", "is_current")
        .orderBy("k", "valid_from").collect().map(_.mkString("|")).toSeq
    val streamed = canon(spark.read.parquet(stateDir))
    val batchReplay = batches.zipWithIndex.foldLeft(
        graft.ext.Scd.scd2Init(batches.head.limit(0), "k", attrs, 0L)) {
      case (s, (b, i)) => graft.ext.Scd.scd2Merge(s, b, "k", attrs, i + 1L)
    }
    assert(streamed == canon(batchReplay))
    // k=1 has three versions (A → A2 → A), k=2/k=3/k=9 one each
    assert(streamed.size == 6)
    // re-run with the same checkpoint: no new files, state untouched
    graft.stream.Scd2Stream.runAvailableNow(spark, streamDir.toString,
      batches.head.schema, stateDir, ckpt, "k", attrs, maxFilesPerTrigger = Some(1))
    assert(canon(spark.read.parquet(stateDir)) == streamed)
  }

  test("streaming MV maintenance equals the one-shot batch view; replayed batch is skipped") {
    import spark.implicits._
    val streamDir = Files.createTempDirectory("graft_mv_stream")
    val viewDir = Files.createTempDirectory("graft_mv_root").resolve("view").toString
    val ckpt = Files.createTempDirectory("graft_mv_ckpt").toString
    val batches = Seq(
      Seq((1L, 100L), (2L, 250L), (1L, 50L)),
      Seq((2L, 10L), (3L, 700L)),
      Seq((1L, 1L), (3L, 2L), (3L, 3L))).map(_.toDF("g", "cents"))
    batches.zipWithIndex.foreach { case (b, i) =>
      val tmp = Files.createTempDirectory(s"graft_mv_b$i")
      b.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      val dest = streamDir.resolve(s"b$i.parquet")
      Files.move(part, dest)
      dest.toFile.setLastModified(1000000L * (i + 1))
    }
    def partial(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("total"))
    graft.stream.MvStream.runAvailableNow(spark, streamDir.toString,
      batches.head.schema, viewDir, ckpt, Seq("g"), partial,
      maxFilesPerTrigger = Some(1))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.select("g", "n", "total").orderBy("g").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val streamed = canon(spark.read.parquet(viewDir))
    assert(streamed == canon(partial(batches.reduce(_ unionByName _))))
    // the atomic marker matched the last batch
    assert(graft.stream.MvStream.lastApplied(spark, viewDir).contains(2L))
    // crash re-delivery of an already-applied batch id must be a no-op
    // (SUM merges are NOT idempotent — this is the exactly-once guard)
    graft.stream.MvStream.applyBatch(spark, viewDir, partial(batches(2)),
      Seq("g"), batchId = 2L)
    assert(canon(spark.read.parquet(viewDir)) == streamed)
    // a genuinely new batch still applies
    graft.stream.MvStream.applyBatch(spark, viewDir,
      partial(Seq((1L, 9L)).toDF("g", "cents")), Seq("g"), batchId = 3L)
    val after = canon(spark.read.parquet(viewDir))
    assert(after.find(_._1 == 1L).get == ((1L, 4L, 160L)))
  }

  test("streaming CMS sketch maintenance equals the batch sketch (MvStream composition)") {
    import spark.implicits._
    // the long-form CMS is (r, bucket, cnt) rows with SUM-mergeable counts
    // — exactly MvStream's contract, so continuous sketch maintenance is
    // pure composition: partial = per-batch sketch, keys = the cell grid
    val streamDir = Files.createTempDirectory("graft_cms_stream")
    val viewDir = Files.createTempDirectory("graft_cms_root").resolve("view").toString
    val ckpt = Files.createTempDirectory("graft_cms_ckpt").toString
    val batches = Seq(
      (0L until 400L).map(i => i % 37),
      (0L until 300L).map(i => i % 11),
      Seq.fill(300)(5L)).map(_.toDF("v"))
    batches.zipWithIndex.foreach { case (b, i) =>
      val tmp = Files.createTempDirectory(s"graft_cms_b$i")
      b.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      val dest = streamDir.resolve(s"b$i.parquet")
      Files.move(part, dest)
      dest.toFile.setLastModified(1000000L * (i + 1))
    }
    def sketch(df: org.apache.spark.sql.DataFrame) = graft.ext.Sketch.cmsMerge(
      graft.ext.Sketch.cmsLongForm(df.withColumn("_g", lit(0)), "_g", "v",
        d = 4, w = 64))
    graft.stream.MvStream.runAvailableNow(spark, streamDir.toString,
      batches.head.schema, viewDir, ckpt, Seq("r", "bucket"), sketch,
      maxFilesPerTrigger = Some(1))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long, Long)] =
      df.select("r", "bucket", "cnt").orderBy("r", "bucket").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val streamed = canon(spark.read.parquet(viewDir))
    val all = batches.reduce(_ unionByName _)
    assert(streamed == canon(sketch(all)))
    // estimates from the STREAMED sketch still satisfy the overestimate law
    val exact = all.groupBy("v").agg(count(lit(1)).as("exact_cnt"))
    graft.ext.Sketch.cmsEstimate(spark.read.parquet(viewDir), exact, "v",
        d = 4, w = 64)
      .collect().foreach { r =>
        assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact_cnt"))
      }
  }

  test("streaming KMV sketch maintenance equals the batch sketch (custom merge hook)") {
    import spark.implicits._
    // KMV's merge is NOT a SUM — it's the k-min set union — so this
    // exercises MvStream's custom-merge hook: the marker/publish/rollback
    // machinery is merge-agnostic, only the fold changes
    val streamDir = Files.createTempDirectory("graft_kmv_stream")
    val viewDir = Files.createTempDirectory("graft_kmv_root").resolve("view").toString
    val ckpt = Files.createTempDirectory("graft_kmv_ckpt").toString
    val batches = Seq(
      (0L until 500L).map(i => (i % 2, i % 131)),
      (0L until 400L).map(i => (i % 2, 100L + i % 97)),
      (0L until 300L).map(i => (1L, 200L + i % 53))).map(_.toDF("g", "v"))
    batches.zipWithIndex.foreach { case (b, i) =>
      val tmp = Files.createTempDirectory(s"graft_kmv_b$i")
      b.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      val dest = streamDir.resolve(s"b$i.parquet")
      Files.move(part, dest)
      dest.toFile.setLastModified(1000000L * (i + 1))
    }
    val k = 64
    def sketch(df: org.apache.spark.sql.DataFrame) = {
      val agg = udaf(new graft.ext.KmvAggregator(k))
      df.select(col("g"), graft.ext.Sketch.kmvHash(col("v")).as("_h"))
        .groupBy("g").agg(agg(col("_h")).as("_sk"))
    }
    val mergeSketches = (base: org.apache.spark.sql.DataFrame,
                         delta: org.apache.spark.sql.DataFrame) => {
      val m = udaf(new graft.ext.KmvMergeAggregator(k))
      base.unionByName(delta).groupBy("g").agg(m(col("_sk")).as("_sk"))
    }
    graft.stream.MvStream.runAvailableNow(spark, streamDir.toString,
      batches.head.schema, viewDir, ckpt, Seq("g"), sketch,
      maxFilesPerTrigger = Some(1), merge = Some(mergeSketches))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Long])] =
      df.select("g", "_sk").orderBy("g").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    val streamed = canon(spark.read.parquet(viewDir))
    val direct = canon(sketch(batches.reduce(_ unionByName _)))
    // streamed-and-merged sketch ≡ sketch built directly over the union:
    // the lossless-merge law, now across micro-batch boundaries
    assert(streamed == direct)
    assert(streamed.forall(_._2.size == k), "fixture should saturate the sketch")
    // crash re-delivery stays a no-op under the custom merge too
    graft.stream.MvStream.applyBatch(spark, viewDir, sketch(batches(2)),
      Seq("g"), batchId = 2L, merge = Some(mergeSketches))
    assert(canon(spark.read.parquet(viewDir)) == streamed)
  }

  test("streaming quantile-sketch maintenance equals the batch sketch (bottom-k merge hook)") {
    import spark.implicits._
    // third member of the sketch triad through the SAME MvStream contract:
    // the bottom-k (hash, value) pair union is the custom merge, everything
    // else (marker, atomic publish, crash skip) is shared machinery
    val streamDir = Files.createTempDirectory("graft_qsk_stream")
    val viewDir = Files.createTempDirectory("graft_qsk_root").resolve("view").toString
    val ckpt = Files.createTempDirectory("graft_qsk_ckpt").toString
    // unique row ids ACROSS batches (the sample-frame contract)
    val batches = Seq(
      (0L until 500L).map(i => (i, i % 2, (i * 13) % 400)),
      (500L until 900L).map(i => (i, i % 2, (i * 7) % 300)),
      (900L until 1200L).map(i => (i, 1L, (i * 3) % 200))).map(_.toDF("id", "g", "v"))
    batches.zipWithIndex.foreach { case (b, i) =>
      val tmp = Files.createTempDirectory(s"graft_qsk_b$i")
      b.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      val dest = streamDir.resolve(s"b$i.parquet")
      Files.move(part, dest)
      dest.toFile.setLastModified(1000000L * (i + 1))
    }
    val k = 64
    def sketch(df: org.apache.spark.sql.DataFrame) = {
      val agg = udaf(new graft.ext.BottomKSampleAggregator(k))
      df.select(col("g"), graft.ext.Sketch.qskHash(col("id")).as("_h"),
          col("v").cast("bigint").as("_v"))
        .groupBy("g").agg(agg(col("_h"), col("_v")).as("_sk"))
    }
    val mergeSketches = (base: org.apache.spark.sql.DataFrame,
                         delta: org.apache.spark.sql.DataFrame) => {
      val m = udaf(new graft.ext.BottomKSampleMergeAggregator(k))
      base.unionByName(delta).groupBy("g").agg(m(col("_sk")).as("_sk"))
    }
    graft.stream.MvStream.runAvailableNow(spark, streamDir.toString,
      batches.head.schema, viewDir, ckpt, Seq("g"), sketch,
      maxFilesPerTrigger = Some(1), merge = Some(mergeSketches))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[(Long, Long)])] =
      df.select("g", "_sk").orderBy("g").collect()
        .map(r => (r.getLong(0),
          r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getLong(1)))))
        .toSeq
    val streamed = canon(spark.read.parquet(viewDir))
    val direct = canon(sketch(batches.reduce(_ unionByName _)))
    // streamed-and-merged ≡ built-directly-over-the-union, across
    // micro-batch boundaries — the lossless bottom-k merge law
    assert(streamed == direct)
    assert(streamed.forall(_._2.size == k), "fixture should saturate the sketch")
    // crash re-delivery stays a no-op under this merge too
    graft.stream.MvStream.applyBatch(spark, viewDir, sketch(batches(2)),
      Seq("g"), batchId = 2L, merge = Some(mergeSketches))
    assert(canon(spark.read.parquet(viewDir)) == streamed)
  }

  test("interrupted publish swap: reads roll _old back and the re-delivered batch converges") {
    import spark.implicits._
    import java.nio.file.{Files => JFiles, Paths}
    // MV side: a crash between publish()'s two renames leaves the primary
    // missing and the previous (state, marker) parked at ._mv_old — reads
    // must recover that pair, not silently reinitialize from empty
    val viewDir = Files.createTempDirectory("graft_mv_crash").resolve("view").toString
    def partial(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("total"))
    graft.stream.MvStream.applyBatch(spark, viewDir,
      partial(Seq((1L, 100L), (2L, 200L)).toDF("g", "cents")), Seq("g"), 0L)
    graft.stream.MvStream.applyBatch(spark, viewDir,
      partial(Seq((1L, 10L), (3L, 30L)).toDF("g", "cents")), Seq("g"), 1L)
    def canonV(): Seq[(Long, Long, Long)] =
      graft.stream.MvStream.readView(spark, viewDir).get
        .select("g", "n", "total").orderBy("g").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val beforeCrash = canonV()
    // simulate the crash window mid-publish of batch 2: primary moved
    // aside, new state still staged
    JFiles.move(Paths.get(viewDir), Paths.get(viewDir + "._mv_old"))
    JFiles.createDirectories(Paths.get(viewDir + "._mv_tmp"))
    assert(graft.stream.MvStream.lastApplied(spark, viewDir).contains(1L))
    assert(canonV() == beforeCrash)
    assert(!JFiles.exists(Paths.get(viewDir + "._mv_tmp"))) // staged cleared
    // the engine re-delivers batch 2; the merge applies it exactly once
    graft.stream.MvStream.applyBatch(spark, viewDir,
      partial(Seq((3L, 5L)).toDF("g", "cents")), Seq("g"), 2L)
    assert(canonV().find(_._1 == 3L).get == ((3L, 2L, 35L)))

    // SCD2 side: same window, state parked at ._scd2_old — readState must
    // roll it back instead of initializing a zero-version state
    val stateDir = Files.createTempDirectory("graft_scd2_crash").resolve("state").toString
    val batch = Seq((1L, "A", 10), (2L, "B", 20)).toDF("k", "seg", "nat")
    val hist = graft.ext.Scd.scd2Merge(
      graft.ext.Scd.scd2Init(batch.limit(0), "k", Seq("seg", "nat"), 0L),
      batch, "k", Seq("seg", "nat"), 1L)
    hist.write.parquet(stateDir)
    JFiles.move(Paths.get(stateDir), Paths.get(stateDir + "._scd2_old"))
    val recovered = graft.stream.Scd2Stream.readState(spark, stateDir, batch,
      "k", Seq("seg", "nat"))
    assert(recovered.count() == 2L)
    assert(JFiles.exists(Paths.get(stateDir)))
  }

  test("streaming link graph: exactly-once edge store; prefix horizons " +
       "monotone (nodes only appear, depths only drop); final ≡ batch " +
       "BFS; checkpoint-loss replay changes nothing (r19)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val seeds = docs.filter(col("doc_id") % 17 === 0).select(col("doc_id"))
    // three arrival files, split by id class
    val chunks = (0 until 3).map { i =>
      val tmp = Files.createTempDirectory(s"graft_lg_chunk$i")
      docs.filter(col("doc_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
    }
    def horizonOf(upTo: Int, store: String): Map[Long, Long] = {
      val sd = Files.createTempDirectory(s"graft_lg_stream$upTo")
      (0 to upTo).foreach(i =>
        Files.copy(chunks(i), sd.resolve(s"c$i.parquet")))
      assert(graft.stream.StreamingLinkGraph.ingest(
        spark, sd.toString, store, n, maxFilesPerTrigger = Some(1)) == upTo + 1)
      graft.stream.StreamingLinkGraph.horizon(spark, store, seeds, 8)
        .as[(Long, Long)].collect().toMap
    }
    val stores = (0 until 3).map(_ =>
      Files.createTempDirectory("graft_lg_store").toString)
    val horizons = (0 until 3).map(k => horizonOf(k, stores(k)))
    // monotone refinement across arrival prefixes
    horizons.sliding(2).foreach { case Seq(a, b) =>
      assert(a.keySet.subsetOf(b.keySet),
        "a reached node must stay reached as edges arrive")
      a.foreach { case (node, d) =>
        assert(b(node) <= d, s"depth of $node must be monotone non-increasing")
      }
    }
    // final horizon ≡ batch BFS over the union edge set
    val batchH = graft.ext.Graph.bfsDepth(
        graft.ext.Crawl.linkEdgesFrom(docs.select(col("doc_id"), col("text")), n),
        "src", "dst", seeds, "doc_id", 8)
      .as[(Long, Long)].collect().toMap
    assert(horizons.last == batchH)
    assert(batchH.size > 10, s"non-vacuity: got ${batchH.size} reached nodes")
    // crash window: checkpoint loss redelivers every batch; the txn log
    // must swallow the replay (same batch ids → same subdirectories)
    val full = stores(2)
    val fs = new org.apache.hadoop.fs.Path(full)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$full/_graft_checkpoint"), true)
    val sd = Files.createTempDirectory("graft_lg_replay")
    (0 until 3).foreach(i => Files.copy(chunks(i), sd.resolve(s"c$i.parquet")))
    assert(graft.stream.StreamingLinkGraph.ingest(
      spark, sd.toString, full, n, maxFilesPerTrigger = Some(1)) == 3,
      "full redelivery expected")
    val replayed = graft.stream.StreamingLinkGraph
      .horizon(spark, full, seeds, 8)
      .as[(Long, Long)].collect().toMap
    assert(replayed == batchH,
      "replayed batches must overwrite their own edges, never duplicate them")
    // duplicate edges would not change BFS — pin the store row count too
    val edgeCount = graft.stream.StreamingLinkGraph.edges(spark, full).count()
    val batchCount = graft.ext.Crawl
      .linkEdgesFrom(docs.select(col("doc_id"), col("text")), n).count()
    assert(edgeCount == batchCount,
      "the committed store must hold each edge exactly once after replay")
  }

  test("incremental link-graph horizon: DELTA relaxation per batch ≡ " +
       "from-scratch BFS of the union, at every arrival prefix; crash " +
       "replay cannot fork the snapshot history (r19)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val chunks = (0 until 3).map { i =>
      val tmp = Files.createTempDirectory(s"graft_lgi_chunk$i")
      docs.filter(col("doc_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
    }
    def batchHorizon(upTo: Int): Map[Long, Long] = {
      val sub = docs.filter(col("doc_id") % 3 <= upTo)
      graft.ext.Graph.bfsDepth(
          graft.ext.Crawl.linkEdgesFrom(sub.select(col("doc_id"), col("text")), n),
          "src", "dst",
          sub.filter(col("doc_id") % 17 === 0).select(col("doc_id")),
          "doc_id", 8)
        .as[(Long, Long)].collect().toMap
    }
    // the incremental maintainer, one arrival file per prefix store
    (0 until 3).foreach { k =>
      val sd = Files.createTempDirectory(s"graft_lgi_stream$k")
      (0 to k).foreach(i => Files.copy(chunks(i), sd.resolve(s"c$i.parquet")))
      val store = Files.createTempDirectory(s"graft_lgi_store$k").toString
      assert(graft.stream.StreamingLinkGraph.ingestIncremental(
        spark, sd.toString, store, n, maxDepth = 8,
        maxFilesPerTrigger = Some(1)) == k + 1)
      val inc = graft.stream.StreamingLinkGraph
        .incrementalHorizon(spark, store)
        .as[(Long, Long)].collect().toMap
      assert(inc == batchHorizon(k),
        s"prefix $k: delta relaxation must equal the from-scratch BFS")
      if (k == 2) {
        assert(inc.size > 10, s"non-vacuity: got ${inc.size} reached nodes")
        // crash window: lose the checkpoint, redeliver everything — the
        // depth snapshots' txn markers fast-skip every replayed append
        val fs = new org.apache.hadoop.fs.Path(store)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(s"$store/_graft_checkpoint"), true)
        assert(graft.stream.StreamingLinkGraph.ingestIncremental(
          spark, sd.toString, store, n, maxDepth = 8,
          maxFilesPerTrigger = Some(1)) == 3, "full redelivery expected")
        val replayed = graft.stream.StreamingLinkGraph
          .incrementalHorizon(spark, store)
          .as[(Long, Long)].collect().toMap
        assert(replayed == inc, "replay must not fork the snapshot history")
      }
    }
  }
}
