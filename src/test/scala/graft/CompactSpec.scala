package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Compact

/** Small-file compaction: file counts drop, rows are untouched, partition
  * layout survives. */
class CompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_compact_$tag").toString + "/t"

  test("compaction merges sliver files; dataset identical before/after") {
    val dir = freshDir("flat")
    val df = (1 to 500).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    df.repartition(40).write.parquet(dir)
    assert(Compact.dataFileCount(spark, dir) >= 30)
    val before = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted

    val (n0, n1) = Compact.compact(spark, dir, maxRecordsPerFile = 10000)
    assert(n0 >= 30 && n1 < n0, s"files $n0 -> $n1")
    assert(n1 <= 4, s"rebalance should pack 500 tiny rows into few files, got $n1")
    val after = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted
    assert(after.toSeq == before.toSeq)
  }

  test("partitioned compaction preserves the partition spec and its pruning") {
    val dir = freshDir("part")
    val df = (1 to 300).map(i => (i.toLong, (i % 3).toString)).toDF("id", "p")
    df.repartition(25).write.partitionBy("p").parquet(dir)
    val before = Compact.dataFileCount(spark, dir)
    assert(before >= 30) // ~25 slivers per partition value

    val (_, n1) = Compact.compact(spark, dir, 10000, partitionCols = Seq("p"))
    assert(n1 <= 6, s"expected ~1 file per partition, got $n1")
    // partition directories still exist → pruning still works
    val pruned = spark.read.parquet(dir).filter(col("p") === "1")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 100)
    assert(scan.contains("PartitionFilters: [isnotnull(p"), scan)
    // max one file read for the pruned partition
    assert(spark.read.parquet(dir).select(input_file_name()).distinct().count() == n1)
  }
}
