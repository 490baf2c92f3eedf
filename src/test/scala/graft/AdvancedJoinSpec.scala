package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{AsOf, RangeJoin}

/** As-of and range join unit semantics on hand-built fixtures. */
class AdvancedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward as-of join picks the latest right row at-or-before, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), "a"),
      (10L, ts("2024-01-01 11:00:00"), "b"),
      (20L, ts("2024-01-01 09:30:00"), "late") // after left row 3 → no match
    ).toDF("user_id", "ts", "tag")
    val out = AsOf.asOfJoinBackward(left, right, "user_id", "ts", Seq("tag"))
      .select("event_id", "asof_tag").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "b"), (3L, null)))
  }

  test("as-of ties: right row at exactly left.ts matches (inclusive)") {
    val left = Seq((1L, 5L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((5L, ts("2024-01-01 10:00:00"), "exact")).toDF("user_id", "ts", "tag")
    val out = AsOf.asOfJoinBackward(left, right, "user_id", "ts", Seq("tag"))
    assert(out.head().getAs[String]("asof_tag") == "exact")
  }

  test("binned range join ≡ naive inequality join") {
    val points = (1 to 500).map(i => (i.toLong, i * 0.7)).toDF("id", "p")
    val intervals = Seq((1L, 10.0, 60.0), (2L, 55.0, 55.5), (3L, 300.0, 400.0))
      .toDF("iid", "lo", "hi")
    val binned = RangeJoin.binnedRangeJoin(points, "p", intervals, "lo", "hi", 25.0)
      .select("id", "iid").orderBy("id", "iid").collect().toSeq
    val naive = points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
      .select("id", "iid").orderBy("id", "iid").collect().toSeq
    assert(binned == naive)
    assert(binned.nonEmpty)
  }

  test("binned range LEFT join preserves unmatched points (≡ naive left join)") {
    val points = (1 to 100).map(i => (i.toLong, i * 5.0)).toDF("id", "p")
    val intervals = Seq((1L, 10.0, 60.0), (2L, 300.0, 400.0)).toDF("iid", "lo", "hi")
    def shape(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = df
      .select(col("id"), coalesce(col("iid"), lit(-1L)).as("iid"))
      .orderBy("id", "iid").collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val binned = shape(RangeJoin.binnedRangeJoin(points, "p", intervals, "lo", "hi", 25.0, "left"))
    val naive = shape(points.join(intervals,
      col("p") >= col("lo") && col("p") < col("hi"), "left"))
    assert(binned == naive)
    assert(binned.exists(_._2 == -1L)) // unmatched points survive
    // small-side-preserving types are rejected, not silently wrong
    assertThrows[IllegalArgumentException] {
      RangeJoin.binnedRangeJoin(points, "p", intervals, "lo", "hi", 25.0, "right")
    }
    assertThrows[IllegalArgumentException] {
      graft.ext.Skew.saltedJoin(points, intervals, "id", 4, "full")
    }
  }
}
