package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.CleanExprs._

/** The `clean_and_transform` equivalent (reference T:136-316): E1-E17 over
  * the bronze frame + A4 keep-newest dedup — one declarative plan, fully
  * codegen'd, no eager statement-at-a-time execution.
  */
object Silver {

  /** A4 (T:140+150): keep the NEWEST record per auction_id. pandas keeps
    * stable input order on auction_date ties; a distributed engine has no
    * input order, so ties break on the deterministic tieBreak columns
    * (default: auction_url). Window + row_number, never dropDuplicates. */
  def keepNewest(df: DataFrame, orderCol: String = "auction_date",
                 keyCol: String = "auction_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol).desc_nulls_last, col("auction_url").asc_nulls_last)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Full cleaning chain in reference order. Input: bronze (Flatten.bronze,
    * validated); output: the processed/silver wide schema (FIXTURES.md §2). */
  def clean(bronze: DataFrame): DataFrame = {
    val withDate = bronze
      .withColumn("auction_date", parseAuctionDate(col("auction_date")))
      .withColumn("auction_id", auctionIdFromUrl(col("auction_url")))
    val deduped = keepNewest(withDate)
    val stats = bidStats(col("bids"))
    deduped
      .withColumn("model", firstLineTrim(col("model")))
      .withColumn("mileage", mileage(col("mileage")))
      .withColumn("highest_bid_value", money(col("highest_bid_value")))
      .withColumn("bid_count", coerceLong(col("bid_count")))
      .withColumn("view_count", countWithDefault(col("view_count")))
      .withColumn("watcher_count", countWithDefault(col("watcher_count")))
      .withColumn("auction_status", statusCanonical(col("auction_status")))
      .withColumn("reserve_met", reserveMet(col("auction_status")))
      .withColumn("seller", firstLineTrim(col("seller")))
      .withColumn("bids", bidsParse(col("bids")))
      .withColumn("title_status_cleaned", titleStatusCleaned(col("title_status")))
      .withColumn("title_state", titleState(col("title_status")))
      .withColumn("city", locationCity(col("location")))
      .withColumn("state", locationState(col("location")))
      .withColumn("transmission_type", transmissionType(col("transmission")))
      .withColumn("gears", gears(col("transmission")))
      .withColumn("drivetrain", drivetrainClass(col("drivetrain")))
      .withColumn("_bid_stats", stats)
      .withColumn("max_bid", col("_bid_stats.max_bid"))
      .withColumn("min_bid", col("_bid_stats.min_bid"))
      .withColumn("mean_bid", col("_bid_stats.mean_bid"))
      .withColumn("median_bid", col("_bid_stats.median_bid"))
      .withColumn("bid_range", col("_bid_stats.bid_range"))
      .drop("_bid_stats")
      .withColumn("highlight_count", listCount(col("auction_highlights")))
      .withColumn("equipment_count", listCount(col("auction_equipment")))
      .withColumn("mod_count", listCount(col("modifications")))
      .withColumn("flaw_count", listCount(col("known_flaws")))
      .withColumn("service_count", listCount(col("services")))
      .withColumn("included_items_count", listCount(col("included_items")))
      .withColumn("video_count", listCount(col("auction_videos")))
      .withColumn("manufacture_year", manufactureYear(col("auction_url")))
  }

  /** Bronze→silver for one batch: validate, clean. The rescrape list is the
    * caller's to collect via [[Validate.rescrapeUrls]] on the same bronze. */
  def run(bronze: DataFrame): DataFrame = clean(Validate.valid(bronze))
}
