package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JdbcStaging

/** S6 exercised for real: write.jdbc truncate-insert + partitioned read.jdbc
  * against in-memory Derby (on the Spark classpath) — the same JdbcUtils /
  * dialect code path a Postgres staging target runs.
  */
class JdbcStagingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_staging;create=true"

  test("truncate-insert round-trips and re-load replaces, not appends") {
    val batch1 = (1L to 100L).map(i => (i, s"auction_$i", i * 1.5)).toDF("id", "auction_id", "price")
    JdbcStaging.truncateInsert(batch1, url, "staging")
    val r1 = JdbcStaging.readPartitioned(spark, url, "staging", "id", 1L, 100L, 4)
    assert(r1.count() == 100)
    assert(r1.rdd.getNumPartitions == 4) // parallel range scan, not one connection
    assert(r1.agg(sum(col("price"))).head().getDouble(0) == (1 to 100).map(_ * 1.5).sum)

    // U3 semantics: second load truncates, it does not append
    val batch2 = (1L to 40L).map(i => (i, s"auction_$i", 2.0)).toDF("id", "auction_id", "price")
    JdbcStaging.truncateInsert(batch2, url, "staging")
    val r2 = JdbcStaging.readPartitioned(spark, url, "staging", "id", 1L, 40L, 2)
    assert(r2.count() == 40)
    assert(r2.agg(sum(col("price"))).head().getDouble(0) == 80.0)
    // schema survives the dialect round-trip
    assert(r2.columns.sorted.toSeq == Seq("auction_id", "id", "price"))
  }
}
