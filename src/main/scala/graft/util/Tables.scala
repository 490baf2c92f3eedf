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
}
