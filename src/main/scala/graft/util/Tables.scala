package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver testdata layout
  * (`/root/testdata/sf{0.001,0.01,0.1}/{name}.parquet`, schemas in
  * FIXTURES.md §5).
  */
object Tables {
  /** `events.ts` is physically TIMESTAMP(NANOS), which Spark only reads as
    * long (`spark.sql.legacy.parquet.nanosAsLong=true`, set in Verify/Bench/
    * test sessions). Normalize to TIMESTAMP_NTZ micros — the testdata is
    * micro-aligned, and NTZ keeps parquet output naive like DuckDB's. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
    else df
  }

  /** [[load]] + conditional round-robin fan-out, for CPU-DENSE consumers
    * (per-row regex/HTML/codec/suffix work, ~1000x more CPU per byte than
    * relational ops): the testdata tables are single-file, single-rowgroup
    * parquet, so their scans are ONE task no matter what
    * `maxPartitionBytes` says (parquet splits at rowgroup boundaries), and
    * every map-side pipeline over them serializes onto one core. When the
    * scan provides fewer partitions than the session's parallelism, fan
    * out with one cheap exchange of the (column-pruned, filter-pushed —
    * both push through a repartition, verified) rows; at production scale
    * inputs split into >= cores partitions and this is the identity, so
    * the shape is scale-adaptive, never a local[32] constant. NOT for
    * map-cheap relational consumers — the exchange would be pure cost
    * (the q185 A/B lesson); call sites opt in per measured pipeline. */
  def loadFan(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = load(spark, dir, name)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
