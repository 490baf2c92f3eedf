package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profile of one query: per completed stage, task count, sum of
  * task run times, shuffle bytes — the instrument for spotting post-shuffle
  * partition collapse (a CPU-dense stage running as ONE task) and double
  * executions (the same pipeline stage appearing twice under a range sort).
  * Usage: runMain graft.ProfileStages <query> [sfDir]
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same env name as Bench (ADVICE r19: the GRAFT_MIN_PART spelling
      // silently diverged from the bench's variable in A/B runs)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "1m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var record = false
    // stage ids seen during the warm run: straggler completion events from
    // run 1 that are still in the bus when the flag flips must not print as
    // run-2 stages (ADVICE r19)
    val warmStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (!record) { warmStages.add(s.stageInfo.stageId); () }
        else if (!warmStages.contains(s.stageInfo.stageId)) {
          val i = s.stageInfo
          val m = i.taskMetrics
          println(f"[stage] ${i.stageId}%4d tasks=${i.numTasks}%4d " +
            f"run=${m.executorRunTime / 1e3}%7.2fs " +
            f"cpu=${m.executorCpuTime / 1e9}%7.2fs " +
            f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.2fMB " +
            f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.2fMB  " +
            i.name.takeWhile(_ != '\n').take(80))
        }
    })
    // warm run first (JIT/codegen), then the profiled run
    (1 to 2).foreach { i =>
      record = i == 2
      println(s"=== run $i ===")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      // stage-completed events arrive async; give the bus a moment to drain
      Thread.sleep(500)
      println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
