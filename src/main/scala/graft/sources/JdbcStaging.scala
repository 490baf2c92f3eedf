package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S6 (SURVEY.md §2.1): the JDBC staging sink — reference
  * `load_lambda/main.py:83-113` truncates the warehouse `staging` table and
  * bulk-inserts the batch over a DB connection.
  *
  * Spark form: `DataFrameWriter.jdbc` with Overwrite + `truncate`, which
  * issues TRUNCATE TABLE and keeps the table's DDL (indexes, grants) instead
  * of drop/recreate — the reference's exact semantics. Reads come back
  * through `read.jdbc` with explicit range partitioning so the scan is
  * parallel across executors (a single-connection JDBC read is the classic
  * scale-killer; `numPartitions` bounds connection fan-out instead).
  *
  * The round-trip is exercised for real against in-memory Derby (on the
  * Spark classpath) in JdbcStagingSpec — same code path (`JdbcUtils`,
  * dialect type mapping) a Postgres target would run.
  */
object JdbcStaging {

  /** U3 over JDBC: truncate `table` (create on first load) and insert `df`.
    * `batchsize` controls rows per INSERT round-trip. */
  def truncateInsert(df: DataFrame, url: String, table: String,
                     properties: Properties = new Properties(),
                     batchSize: Int = 10000): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("truncate", "true")
      .option("batchsize", batchSize)
      .jdbc(url, table, properties)

  /** Range-partitioned parallel read: `numPartitions` concurrent range scans
    * on a numeric `partitionCol` (bounds from the caller — typically a
    * cheap min/max query — so stripes are balanced). */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionCol: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      properties: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, properties)
}
