package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F1/F2 (SURVEY.md §2.3): validity split on auction_status.
  * Reference `extract_invalid_auctions` (transform_lambda/main.py:110-132).
  */
object Validate {

  /** F1 predicate: regex-contains over lowercased status; null → not valid
    * (`rlike` on null is null → filtered, matching pandas `na=False`). */
  val validStatus: Column =
    lower(col("auction_status")).rlike("sold|reserve not met|canceled|cancelled")

  /** Valid rows (kept for cleaning). */
  def valid(df: DataFrame): DataFrame = df.filter(validStatus)

  /** F2: the complement's auction_urls — the rescrape list. One predicate,
    * two single-pass filters (each side prunes at the scan). */
  def rescrapeUrls(df: DataFrame): DataFrame =
    df.filter(!coalesce(validStatus, lit(false))).select(col("auction_url"))
}
