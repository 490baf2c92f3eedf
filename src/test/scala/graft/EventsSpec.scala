package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Corpus, Events}

/** Unit behavior of the event-analytics operators (funnel, retention) and
  * the unigram-LM scorer. */
class EventsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(60000L * min)

  test("funnel: order is strict — a click before the first view does not advance") {
    val ev = Seq(
      // u1 completes in order: view@1, click@2, purchase@3
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // u2 clicks BEFORE viewing, then never clicks again → stops at stage 1
      (2L, ts(1), "click"), (2L, ts(2), "view"), (2L, ts(3), "purchase"),
      // u3 views only
      (3L, ts(5), "view"),
      // u4 never views (click+purchase) → not even stage 1
      (4L, ts(1), "click"), (4L, ts(2), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Events.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("stage").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("1_view", 3L), ("2_click", 1L), ("3_purchase", 1L)))
  }

  test("funnel: equal timestamps do not advance (strictly-after semantics)") {
    val ev = Seq((1L, ts(1), "view"), (1L, ts(1), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Events.funnel(ev, "user_id", "ts", "event_type", Seq("view", "click"))
      .orderBy("stage").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("1_view", 1L), ("2_click", 0L)))
  }

  test("retention: cohort = first active day, offsets count distinct users") {
    def t(day: Int) = new Timestamp(86400000L * day)
    val ev = Seq(
      (1L, t(0)), (1L, t(1)), (1L, t(1)), // u1: cohort 0, back on day 1 (twice)
      (2L, t(0)), (2L, t(2)),             // u2: cohort 0, back on day 2
      (3L, t(1))                          // u3: cohort 1, never back
    ).toDF("user_id", "ts")
    val out = Events.retentionCohorts(ev, "user_id", "ts", "1970-01-01")
      .orderBy("cohort_day", "day_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L)))
  }

  test("unigramLmScore: exact probabilities, OOV floor, document-order sum") {
    val d = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    // counts: a=2, b=1, c=1, total=4; topK=2 → vocab {a: 0.5, b: 0.25}
    // (count desc, token asc puts b ahead of c); OOV floor = 0.5/4 = 0.125
    val out = Corpus.unigramLmScore(d, "doc_id", "text", topK = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toSeq
    assert(out == Seq(
      (1L, 3L, 0L, 0.25, (0.5 + 0.5 + 0.25) / 3.0, true),
      (2L, 1L, 1L, 0.125, 0.125, true)))
  }
}
