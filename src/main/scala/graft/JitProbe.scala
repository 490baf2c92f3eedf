package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main (NOT part of the bench harness): attributes per-attempt
  * JIT cost for a named query by splitting it into its two mechanisms —
  *   - Janino codegen compiles (Spark's static CodegenMetrics): count and
  *     millis of GENERATED-CLASS compilation. A nonzero delta on a repeat
  *     attempt means the generated source changed between attempts (the
  *     class cache is keyed on source text), i.e. the plan embeds
  *     attempt-varying content;
  *   - HotSpot compile millis (CompilationMXBean): background C1/C2 time,
  *     which on a 32-thread box can exceed wall without costing wall.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.JitProbe q44_star_load 3"
  */
object JitProbe {
  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("q44_star_load")
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(qname)
    def hotspotMs: Long =
      Option(java.lang.management.ManagementFactory.getCompilationMXBean)
        .map(_.getTotalCompilationTime).getOrElse(-1L)
    import org.apache.spark.metrics.source.CodegenMetrics._
    for (i <- 1 to reps) {
      val (jc0, jm0) = (METRIC_COMPILATION_TIME.getCount, METRIC_COMPILATION_TIME.getSnapshot.getValues.sum)
      val h0 = hotspotMs
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val jc1 = METRIC_COMPILATION_TIME.getCount
      println(f"attempt $i: wall=$wall%.2fs janino_compiles=${jc1 - jc0} " +
        f"hotspot_jit=${(hotspotMs - h0) / 1e3}%.2fs")
    }
    spark.stop()
  }
}
