package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (SURVEY §2 parity classes mapped to
  * the driver testdata per §7.3, plus the training-data-pipeline extensions);
  * `oracleSql` holds the DuckDB-equivalent of each query that is
  * SQL-expressible (the rest get the driver's rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q05StarRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ ExprQueries.defs ++ DedupQueries.defs ++
      TextQueries.defs ++ SimilarityQueries.defs ++ MultimodalQueries.defs ++
      AdvancedJoinQueries.defs ++ CurationQueries.defs ++ StarLoadQueries.defs ++
      ProfilingQueries.defs ++ WarehouseQueries.defs ++ EventQueries.defs ++
      AuctionQueries.defs ++ WebQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.sql ++ ExprQueries.sql ++ DedupQueries.sql ++
      TextQueries.sql ++ SimilarityQueries.sql ++ MultimodalQueries.sql ++
      AdvancedJoinQueries.sql ++ CurationQueries.sql ++ StarLoadQueries.sql ++
      ProfilingQueries.sql ++ WarehouseQueries.sql ++ EventQueries.sql ++
      AuctionQueries.sql ++ WebQueries.sql
}
