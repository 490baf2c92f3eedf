package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes for the auction pipeline (never infer in production
  * paths — SURVEY.md §1.2 "Schema system").
  *
  * Raw record shape: reference `src/rescrape/scrape_auction.py:29-76`;
  * envelope variants (map `{url → record}` vs list `[record]`):
  * `src/lambdas/transform_lambda/main.py:43-47,97-102`.
  */
object Schemas {

  val auctionStats: StructType = StructType(Seq(
    StructField("reserve_status", StringType),
    StructField("auction_status", StringType),
    StructField("highest_bid_value", StringType),
    StructField("buyer_username", StringType),
    StructField("seller_username", StringType),
    StructField("bid_count", LongType),
    StructField("view_count", LongType),
    StructField("watcher_count", LongType),
    StructField("auction_date", StringType),
    StructField("bids", ArrayType(StringType))
  ))

  /** Keys carry spaces as scraped (`auction_quick_facts`,
    * scrape_auction.py:46-61); P4 normalizes them post-flatten. */
  val quickFacts: StructType = StructType(Seq(
    StructField("Make", StringType),
    StructField("Model", StringType),
    StructField("Mileage", StringType),
    StructField("VIN", StringType),
    StructField("Title Status", StringType),
    StructField("Location", StringType),
    StructField("Seller", StringType),
    StructField("Engine", StringType),
    StructField("Drivetrain", StringType),
    StructField("Transmission", StringType),
    StructField("Body Style", StringType),
    StructField("Exterior Color", StringType),
    StructField("Interior Color", StringType),
    StructField("Seller Type", StringType)
  ))

  val descriptionWithList: StructType = StructType(Seq(
    StructField("description", StringType),
    StructField("bullet_points", ArrayType(StringType))
  ))

  val serviceHistory: StructType = StructType(Seq(
    StructField("description", StringType),
    StructField("items", ArrayType(StringType))
  ))

  /** One raw auction record (all fields nullable, FIXTURES.md §1). */
  val rawRecord: StructType = StructType(Seq(
    StructField("auction_url", StringType),
    StructField("auction_title", StringType),
    StructField("auction_subtitle", StringType),
    StructField("dougs_take", StringType),
    StructField("ownership_history", StringType),
    StructField("auction_stats", auctionStats),
    StructField("auction_quick_facts", quickFacts),
    StructField("auction_highlights", descriptionWithList),
    StructField("service_history", serviceHistory),
    StructField("services", serviceHistory),
    StructField("known_flaws", ArrayType(StringType)),
    StructField("included_items", ArrayType(StringType)),
    StructField("seller_notes", ArrayType(StringType)),
    StructField("auction_videos", ArrayType(StringType)),
    StructField("auction_equipment", ArrayType(StringType)),
    StructField("modifications", ArrayType(StringType))
  ))

  /** The 45-column warehouse projection, in reference order
    * (`load_lambda/main.py:84-92`). */
  val insertColumns: Seq[String] = Seq(
    "auction_date", "auction_id", "vin", "seller_type", "reserve_status",
    "reserve_met", "auction_status", "auction_title", "auction_subtitle",
    "make", "model", "exterior_color", "interior_color", "body_style",
    "mileage", "engine", "drivetrain", "transmission", "transmission_type",
    "gears", "title_status_cleaned", "title_state", "city", "state",
    "bid_count", "view_count", "watcher_count", "highest_bid_value",
    "max_bid", "min_bid", "mean_bid", "median_bid", "bid_range", "bids",
    "highlight_count", "equipment_count", "mod_count", "flaw_count",
    "service_count", "included_items_count", "video_count",
    "manufacture_year", "location", "auction_url", "seller"
  )

  /** Processed/silver wide schema in insertColumns order (FIXTURES.md §2). */
  val processed: StructType = StructType(Seq(
    StructField("auction_date", TimestampType),
    StructField("auction_id", StringType),
    StructField("vin", StringType),
    StructField("seller_type", StringType),
    StructField("reserve_status", StringType),
    StructField("reserve_met", BooleanType),
    StructField("auction_status", StringType),
    StructField("auction_title", StringType),
    StructField("auction_subtitle", StringType),
    StructField("make", StringType),
    StructField("model", StringType),
    StructField("exterior_color", StringType),
    StructField("interior_color", StringType),
    StructField("body_style", StringType),
    StructField("mileage", LongType),
    StructField("engine", StringType),
    StructField("drivetrain", StringType),
    StructField("transmission", StringType),
    StructField("transmission_type", StringType),
    StructField("gears", IntegerType),
    StructField("title_status_cleaned", StringType),
    StructField("title_state", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("bid_count", LongType),
    StructField("view_count", LongType),
    StructField("watcher_count", LongType),
    StructField("highest_bid_value", DoubleType),
    StructField("max_bid", LongType),
    StructField("min_bid", LongType),
    StructField("mean_bid", DoubleType),
    StructField("median_bid", DoubleType),
    StructField("bid_range", LongType),
    StructField("bids", ArrayType(LongType)),
    StructField("highlight_count", IntegerType),
    StructField("equipment_count", IntegerType),
    StructField("mod_count", IntegerType),
    StructField("flaw_count", IntegerType),
    StructField("service_count", IntegerType),
    StructField("included_items_count", IntegerType),
    StructField("video_count", IntegerType),
    StructField("manufacture_year", IntegerType),
    StructField("location", StringType),
    StructField("auction_url", StringType),
    StructField("seller", StringType)
  ))
}
