package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level profile of one query: prints every Spark job's wall time and
  * call site, so composed pipelines (q44/q49) show where driver-action
  * latency goes. Usage: runMain graft.ProfileJobs <query> [sfDir]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val p = Option(j.properties)
        def prop(k: String) = p.flatMap(x => Option(x.getProperty(k)))
        // callSite.short is absent under SQL execution; the job description
        // (write path, action name) is the useful label there
        val site = prop("callSite.short")
          .orElse(prop("spark.job.description").map(_.take(100)))
          .getOrElse("?")
        val nTasks = j.stageInfos.map(_.numTasks).sum
        starts(j.jobId) = (System.nanoTime(), s"tasks=$nTasks  $site")
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, site) =>
          println(f"[job] ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2fs  $site")
        }
    })
    // warm run first (JIT/codegen), then the profiled run
    (1 to 2).foreach { i =>
      println(s"=== run $i ===")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
