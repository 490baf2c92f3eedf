package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{AsOf, RangeJoin}

/** As-of and range join unit semantics on hand-built fixtures. */
class AdvancedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("movingStats: exact decimal running sums, sentinel edges, one window spec") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 1.10),
      (2L, 10L, ts("2024-01-01 11:00:00"), 2.20),
      (3L, 10L, ts("2024-01-01 12:00:00"), 3.30),
      (4L, 10L, ts("2024-01-01 13:00:00"), 4.40),
      (5L, 20L, ts("2024-01-01 10:30:00"), 9.90)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = graft.ext.TimeSeries.movingStats(ev, "user_id", "ts", "event_id", "value")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getDouble(7), r.getDouble(8)))
    assert(out.toSeq == Seq(
      // (id, prev, next, rn, mov_sum3, cum_sum)
      (1L, -1.0, 2.2, 1L, 1.1, 1.1),
      (2L, 1.1, 3.3, 2L, 3.3, 3.3),
      (3L, 2.2, 4.4, 3L, 6.6, 6.6),
      (4L, 3.3, -1.0, 4L, 9.9, 11.0), // mov window slides: 2.2+3.3+4.4
      (5L, -1.0, -1.0, 1L, 9.9, 9.9)))
    // exactness: 1.1+2.2+3.3+4.4 in doubles is 10.999999…; decimal path is 11.0
    assert(out(3)._6 == 11.0)
    // plan: all five window columns share ONE window shuffle (a single sort
    // + at most two WindowExec nodes over the same partitioning — lag/lead/
    // row_number share a frame; the two sums share another)
    val plan = graft.ext.TimeSeries
      .movingStats(ev, "user_id", "ts", "event_id", "value")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size == 1, plan)
  }

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
