package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.star.{Dims, Facts, StarLoad, StateSeed, Warehouse}

/** Phase-level wall-time profile of the composed star loads (q44/q49):
  * staging/dims/vehicle/fact per load, then the readBack dump — so the
  * orchestration-latency work (VERDICT r4 #3) has a measured target.
  * Inlines [[StarLoad.run]]'s stages with timers around each.
  * Usage: runMain graft.ProfilePhases [sfDir]
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    def timedLoad(wh: Warehouse, processed: DataFrame, tag: String): Unit = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext = graft.util.Exec.loadEc
      time(s"$tag seed")(StateSeed.ensureSeeded(wh))
      val staging = time(s"$tag staging build")(
        graft.etl.Silver.keepNewest(processed.select(graft.schema.Schemas.insertColumns.map(col): _*))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      time(s"$tag staging count")(staging.count())
      val stagingWriteF = Future(time(s"$tag staging write")(wh.truncateInsert("staging", staging)))
      try {
        val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
        val shufWas = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        // the FUSED dim phases StarLoad.run actually executes — profiling
        // the old per-dim wave overstated this phase ~3× (it is kept in git
        // history; swap back only to compare fused vs per-dim)
        time(s"$tag simple dims fused")(Dims.loadSimpleDimsFused(wh, staging))
        time(s"$tag compound dims fused")(Dims.loadCompoundDimsFused(wh, staging))
        spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
        spark.conf.set("spark.sql.shuffle.partitions", shufWas)
        val (merged, prevMax) = time(s"$tag vehicle merge")(Facts.mergedVehicleDim(wh, staging))
        val writeF = Future(time(s"$tag vehicle write")(Facts.writeVehicleDim(wh, merged, prevMax)))
        time(s"$tag fact insert")(Facts.insertAuctionFact(wh, staging, Some(merged)))
        Await.result(writeF, Duration.Inf)
        Await.result(stagingWriteF, Duration.Inf)
      } finally { staging.unpersist(); () }
    }

    (1 to 2).foreach { i =>
      println(s"=== run $i ===")
      val wh = new Warehouse(spark,
        java.nio.file.Files.createTempDirectory("graft_prof_wh").toString)
      val full = graft.queries.StarLoadQueries.syntheticProcessed(spark, sfDir)
        .filter(substring(col("auction_id"), 2, 10).cast("long") <= 40000)
      val key = substring(col("auction_id"), 2, 10).cast("long")
      val batch1 = full.filter(key <= 26000)
      val corrections = batch1.filter(key % 5 === 0)
        .withColumn("mileage", col("mileage") + lit(1111L))
      val batch2 = full.filter(key > 26000).unionByName(corrections)
      val t0 = System.nanoTime()
      timedLoad(wh, batch1, "L1")
      timedLoad(wh, batch2, "L2")
      time("readback+dump")(
        graft.queries.StarLoadQueries.readBackFor(wh)
          .write.format("noop").mode("overwrite").save())
      println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
