package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.star.Warehouse

/** The Warehouse small-dim read cache: cached plans are reused between
  * writes, and EVERY write path (append, overwrite, overwritePartitions)
  * invalidates — a stale cached dim would silently corrupt later loads.
  */
class WarehouseCacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("readCached reuses the plan; every write path invalidates") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_whcache").toString)

    wh.overwrite("d", Seq((1L, "a")).toDF("id", "k"))
    val first = wh.readCached("d")
    assert(first.count() == 1)
    assert(wh.readCached("d") eq first) // same cached DataFrame, no rescan

    wh.append("d", Seq((2L, "b")).toDF("id", "k"))
    val afterAppend = wh.readCached("d")
    assert(!(afterAppend eq first) && afterAppend.count() == 2)

    wh.overwrite("d", Seq((9L, "z")).toDF("id", "k"))
    assert(wh.readCached("d").count() == 1)

    wh.overwritePartitions("p",
      Seq((1L, 0), (2L, 1)).toDF("id", "part"), "part")
    val p1 = wh.readCached("p")
    assert(p1.count() == 2)
    wh.overwritePartitions("p", Seq((3L, 1)).toDF("id", "part"), "part")
    val p2 = wh.readCached("p")
    assert(!(p2 eq p1))
    // partition 0 untouched, partition 1 replaced
    assert(p2.count() == 2)
    assert(p2.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }
}
