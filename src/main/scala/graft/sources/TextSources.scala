package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S3/S8 (SURVEY.md §2.1): the plain-text URL-list source and sink.
  * Reference: `src/rescrape/main.py:13-38` (read, skip blanks) and
  * `write_rescrape_urls_lambda/main.py:23-34` (newline-joined PUT).
  */
object TextSources {

  /** Text-lines source: one URL per line, blank lines skipped. */
  def readUrlList(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.read.textFile(path).filter(length(trim(col("value"))) > 0).as[String]
  }

  /** Text sink: single newline-joined object (the reference writes ONE S3
    * object, so a single output partition is the faithful layout — callers
    * at scale should shard instead). */
  def writeUrlList(urls: DataFrame, path: String): Unit =
    urls.coalesce(1).write.mode("overwrite").text(path)
}
