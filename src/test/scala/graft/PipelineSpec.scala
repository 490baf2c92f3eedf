package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.{Flatten, MergeWrite, Silver, Validate}

/** Golden end-to-end fixture through bronze→silver→merge (SURVEY.md §5.3):
  * both envelope shapes, invalid-status rescrape split, keep-newest dedup,
  * merge idempotence.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // model default carries a JSON-escaped newline (\n inside the JSON string)
  private def rec(url: String, status: String, date: String, model: String = "F-150\\nSave",
                  bids: String = """["$1,000","$2,500","$2,000"]""",
                  location: String = "Dallas, TX 75001",
                  title: String = "Clean (CA)"): String =
    s"""{
       |"auction_url": "$url",
       |"auction_title": "t", "auction_subtitle": "s", "dougs_take": "d",
       |"auction_stats": {"reserve_status": "Reserve", "auction_status": "$status",
       |  "highest_bid_value": "2,500", "bid_count": 3,
       |  "auction_date": "$date", "bids": $bids},
       |"auction_quick_facts": {"Make": "Ford", "Model": "$model", "Mileage": "45,000 miles",
       |  "VIN": "VIN001", "Title Status": "$title", "Location": "$location",
       |  "Seller": "bob\\nFollow", "Engine": "5.0L V8", "Drivetrain": "Rear-wheel drive",
       |  "Transmission": "6-Speed Manual", "Body Style": "Truck",
       |  "Exterior Color": "Red", "Interior Color": "Black", "Seller Type": "Dealer"},
       |"auction_highlights": {"description": "hl", "bullet_points": ["a","b"]},
       |"service_history": {"description": "sh", "items": ["s1"]},
       |"known_flaws": ["f1","f2","f3"],
       |"included_items": ["i1"],
       |"seller_notes": ["n1"],
       |"auction_videos": ["v1","v2"]
       |}""".stripMargin

  private val dir = Files.createTempDirectory("graft_raw").toString

  // map envelope: valid AAA111 (newer) + invalid CCC333
  Files.writeString(Paths.get(s"$dir/map.json"),
    s"""{"https://carsandbids.com/auctions/AAA111/2015-ford-f150": ${rec("ignored", "Sold to winner", "2024-05-02 10:00:00")},
       |"https://carsandbids.com/auctions/CCC333/2018-bmw-m3": ${rec("ignored", "junk status", "2024-05-02 11:00:00")}}""".stripMargin)
  // list envelope: AAA111 duplicate (older, different model) + BBB222 edge cases
  Files.writeString(Paths.get(s"$dir/list.json"),
    s"""[${rec("https://carsandbids.com/auctions/AAA111/2015-ford-f150", "Sold to winner", "2024-05-01 09:00:00", model = "OLD-MODEL")},
       |${rec("https://carsandbids.com/auctions/BBB222/1999-mazda-miata", "Reserve not met, bid to " + "$9,000", "2024-05-02 12:00:00",
      model = "Miata", bids = """["$9,000","junk"]""", location = "Berlin", title = "Salvage")}]""".stripMargin)

  lazy val bronze = Flatten.bronze(spark, dir)
  lazy val silver = Silver.run(bronze).cache()

  test("P1-P4: both envelopes flatten; map key wins as auction_url") {
    assert(bronze.count() == 4)
    assert(bronze.columns.contains("title_status")) // "Title Status" normalized
    val urls = bronze.select("auction_url").collect().map(_.getString(0)).toSet
    assert(urls.contains("https://carsandbids.com/auctions/AAA111/2015-ford-f150"))
    assert(!urls.contains("ignored"))
  }

  test("F2: invalid status rows feed the rescrape list (null-safe)") {
    val urls = Validate.rescrapeUrls(bronze).collect().map(_.getString(0))
    assert(urls.toSeq == Seq("https://carsandbids.com/auctions/CCC333/2018-bmw-m3"))
  }

  test("silver: keep-newest dedup + full expression chain") {
    val rows = silver.orderBy("auction_id").collect()
    assert(rows.length == 2)
    val a = silver.filter(col("auction_id") === "AAA111").head()
    assert(a.getAs[String]("model") == "F-150") // newest record won, E3 applied
    assert(a.getAs[Long]("mileage") == 45000L)
    assert(a.getAs[String]("auction_status") == "Sold winner")
    assert(!a.getAs[Boolean]("reserve_met"))
    assert(a.getSeq[Long](a.fieldIndex("bids")) == Seq(1000L, 2500L, 2000L))
    assert(a.getAs[Long]("max_bid") == 2500L)
    assert(a.getAs[Double]("median_bid") == 2000.0)
    assert(a.getAs[String]("city") == "Dallas")
    assert(a.getAs[String]("state") == "TX")
    assert(a.getAs[String]("title_state") == "CA")
    assert(a.getAs[String]("transmission_type") == "Manual")
    assert(a.getAs[Int]("gears") == 6)
    assert(a.getAs[String]("drivetrain") == "RWD")
    assert(a.getAs[Int]("manufacture_year") == 2015)
    assert(a.getAs[Int]("highlight_count") == 2)
    assert(a.getAs[Int]("service_count") == 1)
    assert(a.getAs[Int]("flaw_count") == 3)
    val b = silver.filter(col("auction_id") === "BBB222").head()
    assert(b.getSeq[Long](b.fieldIndex("bids")) == Seq()) // E10 all-or-nothing
    assert(b.isNullAt(b.fieldIndex("max_bid"))) // E13 guard
    assert(b.getAs[String]("city") == "Berlin")
    assert(b.isNullAt(b.fieldIndex("state")))
    assert(b.isNullAt(b.fieldIndex("title_state")))
    // E8 whole-cell quirk: suffix present → unchanged
    assert(b.getAs[String]("auction_status") == "Reserve not met, bid to $9,000")
  }

  test("S5: merge-write is keep-newest and idempotent") {
    val processed = Files.createTempDirectory("graft_processed").toString + "/t"
    MergeWrite.mergeWrite(spark, processed, silver)
    val first = MergeWrite.readProcessed(spark, processed)
    assert(first.count() == 2)
    // re-merge the same batch → unchanged (idempotence, merge(merge(x))==merge(x))
    MergeWrite.mergeWrite(spark, processed, silver)
    assert(MergeWrite.readProcessed(spark, processed).count() == 2)
    // newer record (same date partition, later time) for AAA111 wins on re-merge
    val updated = silver.filter(col("auction_id") === "AAA111")
      .withColumn("auction_date", col("auction_date") + expr("INTERVAL 1 HOUR"))
      .withColumn("model", lit("RAPTOR"))
    MergeWrite.mergeWrite(spark, processed, updated)
    val after = MergeWrite.readProcessed(spark, processed)
    assert(after.count() == 2)
    assert(after.filter(col("auction_id") === "AAA111").head().getAs[String]("model") == "RAPTOR")
  }

  test("S5 durable mode: staging-dir double write produces the identical table") {
    // run the same three merges as the default-mode test but with
    // durable = true; row-for-row identical outcome, and the staging dir
    // must not survive the call
    val base = Files.createTempDirectory("graft_processed_dur").toString
    val processed = base + "/t"
    MergeWrite.mergeWrite(spark, processed, silver, durable = true)
    MergeWrite.mergeWrite(spark, processed, silver, durable = true)
    val updated = silver.filter(col("auction_id") === "AAA111")
      .withColumn("auction_date", col("auction_date") + expr("INTERVAL 1 HOUR"))
      .withColumn("model", lit("RAPTOR"))
    MergeWrite.mergeWrite(spark, processed, updated, durable = true)
    val dur = MergeWrite.readProcessed(spark, processed)
    assert(dur.count() == 2)
    assert(dur.filter(col("auction_id") === "AAA111").head().getAs[String]("model") == "RAPTOR")
    // same sequence through the default localCheckpoint path → same rows
    val processed2 = Files.createTempDirectory("graft_processed_ref").toString + "/t"
    MergeWrite.mergeWrite(spark, processed2, silver)
    MergeWrite.mergeWrite(spark, processed2, silver)
    MergeWrite.mergeWrite(spark, processed2, updated)
    val ref = MergeWrite.readProcessed(spark, processed2)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(ref.columns.sorted.map(col).toIndexedSeq: _*)
        .collect().map(_.toString).sorted.toSeq
    assert(canon(dur) == canon(ref))
    // no staging dir (fixed-name or legacy nanotime-suffixed) survives
    val fs = new org.apache.hadoop.fs.Path(processed)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(processed + "__staging*")).isEmpty)
  }

  test("S5 durable mode sweeps orphaned staging dirs from a crashed prior run") {
    val base = Files.createTempDirectory("graft_processed_orph").toString
    val processed = base + "/t"
    // simulate a driver death mid-durable-write: an orphaned staging dir
    // (legacy nanotime-suffixed name) holding stale rows. stagingTtlMs = 0
    // makes the just-written orphan "old enough" — in production the 1h
    // default means only dirs a dead run actually abandoned are swept.
    val orphan = processed + "__staging_123456789"
    silver.withColumn("model", lit("STALE")).write.parquet(orphan)
    MergeWrite.mergeWrite(spark, processed, silver, durable = true,
      stagingTtlMs = 0L)
    val fs = new org.apache.hadoop.fs.Path(processed)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the orphan was swept on entry, the run's own staging dir removed,
    // and the table holds the fresh batch (no STALE rows)
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(processed + "__staging*")).isEmpty)
    val rows = MergeWrite.readProcessed(spark, processed)
    assert(rows.count() == silver.count())
    assert(rows.filter(col("model") === "STALE").count() == 0)
    // no leaked staging dirs next to the table
    val leftovers = new java.io.File(base).listFiles()
      .map(_.getName).filter(_.contains("__staging_"))
    assert(leftovers.isEmpty, s"staging leftovers: ${leftovers.toSeq}")
  }

  test("S5 durable mode: a live concurrent run's fresh staging dir survives " +
    "the sweep; non-staging siblings are never touched") {
    val base = Files.createTempDirectory("graft_processed_conc").toString
    val processed = base + "/t"
    // a FRESH staging dir = a concurrent mergeWrite mid-flight; with the
    // default 1h TTL it must NOT be deleted by this run's entry sweep
    val inflight = processed + "__staging_deadbeef-0000-4000-8000-000000000000"
    silver.withColumn("model", lit("INFLIGHT")).write.parquet(inflight)
    // a sibling path that merely starts with the prefix but is not
    // staging-shaped (the ADVICE r14 over-match case) must survive even
    // with TTL 0
    val sibling = processed + "__staging_notes.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(sibling), "keep me")
    MergeWrite.mergeWrite(spark, processed, silver, durable = true)
    val fs = new org.apache.hadoop.fs.Path(processed)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(inflight)),
      "fresh concurrent staging dir was swept")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(sibling)))
    // table itself is correct and this run's own staging dir is gone
    assert(MergeWrite.readProcessed(spark, processed).count() == silver.count())
    val own = fs.globStatus(new org.apache.hadoop.fs.Path(processed + "__staging_*"))
      .map(_.getPath.getName)
      .filterNot(_ == new org.apache.hadoop.fs.Path(inflight).getName)
      .filterNot(_ == "t__staging_notes.txt")
    assert(own.isEmpty, s"own staging leaked: ${own.toSeq}")
  }

  test("S5 durable sweep ages on the NEWEST file under a staging dir: a " +
    "write outliving the TTL survives while its tasks still produce files") {
    val base = Files.createTempDirectory("graft_processed_long").toString
    val processed = base + "/t"
    val inflight = new org.apache.hadoop.fs.Path(
      processed + "__staging_aaaaaaaa-1111-4111-8111-111111111111")
    silver.withColumn("model", lit("LONGRUN")).write.parquet(inflight.toString)
    val fs = inflight.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // backdate the dir and every file 2h: the dir-mtime gate would sweep it
    val old = System.currentTimeMillis() - 7200000L
    def backdateAll(): Unit = {
      fs.setTimes(inflight, old, old)
      val it = fs.listFiles(inflight, true)
      while (it.hasNext) fs.setTimes(it.next().getPath, old, old)
    }
    backdateAll()
    // ...but one FRESH nested file = a task still writing right now
    fs.create(new org.apache.hadoop.fs.Path(inflight, "_task_in_progress")).close()
    MergeWrite.mergeWrite(spark, processed, silver, durable = true,
      stagingTtlMs = 3600000L)
    assert(fs.exists(inflight),
      "a live long-running write was swept on the stale dir mtime")
    // once nothing under it is fresh anymore, the same TTL sweeps it
    backdateAll()
    MergeWrite.mergeWrite(spark, processed, silver, durable = true,
      stagingTtlMs = 3600000L)
    assert(!fs.exists(inflight), "a truly abandoned staging dir must sweep")
  }

  test("q184 committed fixture still exercises every FIXTURES.md §1 edge " +
    "case (guards fixture erosion — the oracle only proves engine parity)") {
    val silver184 = Silver.run(
      Flatten.bronze(spark, graft.queries.AuctionQueries.FixtureDir)).cache()
    assert(silver184.count() == 8, "2 invalid + 1 dup must fall out of 11 raw")
    def one(id: String) = silver184.filter(col("auction_id") === id).head()
    // keep-newest resolved ACROSS envelopes: map's newer AAA111 beat list's
    assert(one("AAA111").getAs[String]("model") == "F-150")
    // epoch-millis date branch (E1) taken
    assert(one("DDD444").getAs[java.sql.Timestamp]("auction_date") != null)
    // reserve_met true requires the exact canonical 'Sold'
    assert(one("DDD444").getAs[Boolean]("reserve_met"))
    assert(!one("AAA111").getAs[Boolean]("reserve_met")) // 'Sold winner'
    // E10 all-or-nothing: unparseable member nukes the list
    assert(one("BBB222").getSeq[Long](one("BBB222").fieldIndex("bids")).isEmpty)
    // E8 whole-cell quirk: exact form canonicalizes, suffixed form survives
    assert(one("FFF666").getAs[String]("auction_status") == "Reserve not met")
    assert(one("EEE555").getAs[String]("auction_status")
      .startsWith("Reserve not met, bid to $"))
    // E12: comma-less and multi-comma locations
    assert(one("EEE555").isNullAt(one("EEE555").fieldIndex("state")))
    assert(one("FFF666").getAs[String]("city") == "Washington, D.C.")
    // E17 non-numeric year slug + null-date record
    assert(one("GGG777").isNullAt(one("GGG777").fieldIndex("manufacture_year")))
    // services alias key populated the count
    assert(one("DDD444").getAs[Int]("service_count") == 2)
    silver184.unpersist()
  }

  test("F2→S8→S3→merge: the full rescrape correction loop, newest wins in processed + star") {
    // round 1: ingest the golden fixture — CCC333 is invalid and held out
    val processed = Files.createTempDirectory("graft_loop_proc").toString + "/t"
    val whDir = Files.createTempDirectory("graft_loop_wh").toString
    val wh = new graft.star.Warehouse(spark, whDir)
    MergeWrite.mergeWrite(spark, processed, silver)
    graft.star.StarLoad.run(wh, silver)
    assert(MergeWrite.readProcessed(spark, processed).count() == 2)
    assert(wh.read("auction_fact").count() == 2)

    // the rescrape list flows through the S8 text sink and back via S3
    val listDir = Files.createTempDirectory("graft_loop_list").toString + "/urls"
    graft.sources.TextSources.writeUrlList(Validate.rescrapeUrls(bronze), listDir)
    val toRescrape = graft.sources.TextSources.readUrlList(spark, listDir).collect().toSeq
    assert(toRescrape == Seq("https://carsandbids.com/auctions/CCC333/2018-bmw-m3"))

    // "rescrape" produces a corrected record for the listed URL (now valid,
    // newer) plus a fresher AAA111 revision — the reference's merge-wins
    // path. Corrections keep their auction's date (same partition object):
    // the merge is per date-object, so a LATER time on the SAME date is what
    // "newest wins" means here
    val correctedDir = Files.createTempDirectory("graft_loop_raw").toString
    Files.writeString(Paths.get(s"$correctedDir/corrected.json"),
      s"""{"${toRescrape.head}": ${rec("ignored", "Sold to winner", "2024-05-02 13:00:00", model = "M3")},
         |"https://carsandbids.com/auctions/AAA111/2015-ford-f150": ${rec("ignored", "Sold to winner", "2024-05-02 23:00:00", model = "RAPTOR")}}""".stripMargin)
    val corrected = Silver.run(Flatten.bronze(spark, correctedDir))
    assert(Validate.rescrapeUrls(Flatten.bronze(spark, correctedDir)).count() == 0)

    // re-ingest: merge into processed, load into the star — newest wins
    MergeWrite.mergeWrite(spark, processed, corrected)
    val after = MergeWrite.readProcessed(spark, processed)
    assert(after.count() == 3) // CCC333 recovered
    assert(after.filter(col("auction_id") === "CCC333").head()
      .getAs[String]("auction_status") == "Sold winner")
    assert(after.filter(col("auction_id") === "AAA111").head()
      .getAs[String]("model") == "RAPTOR") // newer revision won
    graft.star.StarLoad.run(wh, corrected)
    val fact = wh.read("auction_fact")
    assert(fact.count() == 3) // corrected row inserted; existing rows kept (U1)
    assert(fact.select("auction_id").distinct().count() == 3)
    // the corrected vehicle upserted with the revised model resolved (U2)
    val vd = wh.read("vehicle_dim")
    assert(vd.filter(col("auction_id") === "CCC333").count() == 1)
  }

  test("S5: merge rewrites only the affected date partitions (file-level)") {
    val processed = Files.createTempDirectory("graft_mw_prune").toString + "/t"
    // a second auction two days later → a second date partition on disk
    val day2 = silver.filter(col("auction_id") === "BBB222")
      .withColumn("auction_date", col("auction_date") + expr("INTERVAL 2 DAYS"))
      .withColumn("auction_id", lit("DDD444"))
    MergeWrite.mergeWrite(spark, processed, silver.unionByName(day2))

    def files(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(processed)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val dirs = new java.io.File(processed).listFiles()
      .filter(_.getName.startsWith(MergeWrite.PartitionCol)).map(_.getName).sorted
    assert(dirs.length == 2, dirs.mkString(","))
    val day2Dir = dirs.last

    val before = files()
    // correction touching ONLY the later date
    val upd = day2
      .withColumn("auction_date", col("auction_date") + expr("INTERVAL 1 HOUR"))
      .withColumn("model", lit("NEWMODEL"))
    MergeWrite.mergeWrite(spark, processed, upd)
    val after = files()

    // the untouched date partition's files are byte-identical
    assert(before.filterNot(_._1.contains(day2Dir)) ==
      after.filterNot(_._1.contains(day2Dir)))
    // the affected partition WAS rewritten, with the merge applied
    assert(before.keySet.filter(_.contains(day2Dir)) !=
      after.keySet.filter(_.contains(day2Dir)))
    val merged = MergeWrite.readProcessed(spark, processed)
    assert(merged.count() == 3)
    assert(merged.filter(col("auction_id") === "DDD444")
      .head().getAs[String]("model") == "NEWMODEL")
  }
}
