package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // static conf, must be set before the session exists: the default
      // 100-entry generated-class cache thrashes on a 100+-query run (a
      // single composed load emits >100 codegen units, so even its OWN
      // second attempt recompiled everything — Janino time, not query time)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: session/codegen/JIT bootstrap is not query cost —
    // without it the first query absorbs ~5s of one-time initialization
    try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = spark.read.parquet(s"$sfDir/region.parquet").limit(5)
      w.join(broadcast(w.select(col("r_regionkey").as("k"))),
          col("r_regionkey") === col("k"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("r_regionkey")).orderBy(col("k"))))
        .count()
    } catch { case _: Throwable => () }
    // a failed query must surface as an error, never as a fast timing.
    // Each query runs twice and reports the min: single-run numbers at this
    // scale are dominated by page-cache/first-scanner noise (±0.5 s), which
    // drowned real plan deltas in round-over-round comparisons.
    // `noop`-format write, NOT count(): a count lets Catalyst prune every
    // unevaluated projection, so map-only expression queries would be timed
    // as bare row-count scans. The noop sink consumes full rows — the bench
    // times what the verify path actually executes. (Levels shifted up vs
    // r3 for projection-only queries; see NOTES.md.)
    // optional comma-separated query filter for local iteration, e.g.
    // SPARK_GRAFT_ONLY=q44_star_load — the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // UNTIMED inter-query hygiene, so query N's cost never bleeds into
    // query N+1's number (the cross-query contamination that made one
    // composed load 2× slower at position 50 of a full run than isolated):
    // drop every persisted RDD left over from the previous query — each
    // query builds its state from scratch, so at a query boundary every
    // still-persisted block (localCheckpoints, persists whose owner went
    // out of scope) is garbage that would otherwise pin storage memory
    // until a GC cycle lets the ContextCleaner reap it — then one explicit
    // GC so weak-ref cleanup and finalization run now, not mid-measurement.
    def quiesce(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      System.gc()
    }
    val runs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      // total JVM GC wall across all collectors — per-query deltas are the
      // first thing to read when a driver-box number diverges from a local
      // one (the r7 story): a query whose gc share explains the gap is a
      // heap/contamination problem, not a plan problem
      def gcMillis: Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
      }
      val attempts = (1 to 2).map { attempt =>
        // quiesce on QUERY boundaries only (attempt 1): that is where the
        // contamination vector lives — attempt 2 then measures steady
        // state, because the A/B (SPARK_GRAFT_NO_QUIESCE, driver never
        // sets it) showed the gc's concurrent aftershocks + async block
        // removals land inside the next timed region (~15% on composed
        // loads on an unpressured box)
        if (attempt == 1 && !sys.env.contains("SPARK_GRAFT_NO_QUIESCE")) quiesce()
        val g0 = gcMillis
        val t0 = System.nanoTime()
        val err = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None
        } catch {
          case e: Throwable =>
            Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
        ((System.nanoTime() - t0) / 1e9, err, (gcMillis - g0) / 1e3)
      }
      val ok = attempts.collect { case (t, None, g) => (t, g) }
      val best = if (ok.nonEmpty) ok.minBy(_._1) else (-1.0, 0.0)
      (name, best._1, if (ok.isEmpty) attempts.head._2 else None, best._2)
    }
    val qs = runs.map { case (k, v, e, _) => s"\"" + k + "\":" + (if (e.isDefined) -1.0 else v) }
      .mkString("{", ",", "}")
    // every control char (not just \n\r\t) must be mapped out or the JSON
    // line is unparseable
    def jstr(s: String) = "\"" + s.replaceAll("[\\x00-\\x1f\\\\\"]", " ") + "\""
    val errs = runs.collect { case (k, _, Some(e), _) => s"\"" + k + "\":" + jstr(e) }
      .mkString("{", ",", "}")
    // gc seconds inside the reported (min) attempt, per query — diagnostic
    // only, rounded to avoid double-noise in the line
    val gcs = runs.map { case (k, _, _, g) => s"\"" + k + "\":" + math.round(g * 1000) / 1000.0 }
      .mkString("{", ",", "}")
    val total = runs.collect { case (_, v, None, _) => v }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"gc":$gcs,"sf":"$sfDir"}"""
    println(line)
    // the stdout line is >4 KB at 100+ queries and output-capture windows
    // truncate it — ALSO dump the same JSON whole to a file (overridable;
    // default lands in the repo cwd for the round artifacts)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
