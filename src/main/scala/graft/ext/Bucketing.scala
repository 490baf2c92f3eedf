package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffle a fact table once at write time so
  * every later equi-join or aggregation on the bucket key runs shuffle-free
  * (SURVEY.md §7.4: "co-located joins via bucketing"). At 100 TB this turns
  * the recurring star-join shuffle into a one-time layout cost.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (Hive-style layout in
    * the session warehouse dir). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // clear an orphaned managed location (e.g. from an aborted write)
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True if the physical plan of `df` contains a shuffle exchange —
    * bucketed-join assertions use this. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
      case _ => false
    }
}
