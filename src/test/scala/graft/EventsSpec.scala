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
    assert(out == Seq(("01_view", 3L), ("02_click", 1L), ("03_purchase", 1L)))
  }

  test("funnel: equal timestamps do not advance (strictly-after semantics)") {
    val ev = Seq((1L, ts(1), "view"), (1L, ts(1), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Events.funnel(ev, "user_id", "ts", "event_type", Seq("view", "click"))
      .orderBy("stage").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("01_view", 1L), ("02_click", 0L)))
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

  test("snapshotDiff: insert/update/delete only — unchanged rows never emitted") {
    val v1 = Seq((1L, Some("A"), 10), (2L, Some("B"), 20), (3L, Some("C"), 30),
        (4L, Option.empty[String], 40))
      .toDF("k", "seg", "nat")
    val v2 = Seq((1L, Some("A"), 10), (2L, Some("B2"), 20), (4L, Some("X"), 40), (9L, Some("N"), 90))
      .toDF("k", "seg", "nat")
    val out = graft.ext.Scd.snapshotDiff(v1, v2, "k", Seq("seg", "nat"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)), r.getInt(3))).toSeq
    assert(out == Seq(
      ("update", 2L, Some("B2"), 20),   // B -> B2
      ("delete", 3L, Some("C"), 30),    // gone in v2, old values
      ("update", 4L, Some("X"), 40),    // NULL -> X is a change (null-safe)
      ("insert", 9L, Some("N"), 90)))   // new key, new values
    // k=1 unchanged -> absent
  }

  test("applyDiff roundtrip: applyDiff(v1, snapshotDiff(v1, v2)) ≡ v2") {
    val v1 = Seq((1L, Some("A"), 10), (2L, Some("B"), 20), (3L, Some("C"), 30),
        (4L, Option.empty[String], 40))
      .toDF("k", "seg", "nat")
    val v2 = Seq((1L, Some("A"), 10), (2L, Some("B2"), 20), (4L, Some("X"), 40), (9L, Some("N"), 90))
      .toDF("k", "seg", "nat")
    val diff = graft.ext.Scd.snapshotDiff(v1, v2, "k", Seq("seg", "nat"))
    val rebuilt = graft.ext.Scd.applyDiff(v1, diff, "k", Seq("seg", "nat"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getInt(2))).toSeq
    val want = v2.orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getInt(2))).toSeq
    assert(rebuilt == want)
    // empty diff is the identity
    val id = graft.ext.Scd.applyDiff(v1, diff.limit(0), "k", Seq("seg", "nat"))
    assert(id.orderBy("k").collect().toSeq == v1.orderBy("k").collect().toSeq)
  }

  test("gapFillDaily: silent days appear with zero counts and null measure") {
    def t(day: Int) = new Timestamp(86400000L * day)
    val df = Seq((t(0), 10.0), (t(0), 5.0), (t(3), 2.0)).toDF("ts", "v")
    val out = graft.ext.Events.gapFillDaily(df, "ts", "1970-01-01",
        Seq((count(lit(1)), "n"), (sum(col("v")), "sv")))
      .orderBy("day").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(out == Seq(
      (0L, Some(2L), Some(15.0)),
      (1L, None, None),
      (2L, None, None),
      (3L, Some(1L), Some(2.0))))
  }

  test("stratifiedSample: exactly n per stratum, deterministic, rank dense") {
    val df = (0L until 100L).map(i => (s"s${i % 3}", i)).toDF("source", "doc_id")
    val a = graft.ext.Sampling.stratifiedSample(df, "source", "doc_id", 5)
      .orderBy("source", "sample_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val b = graft.ext.Sampling.stratifiedSample(df, "source", "doc_id", 5)
      .orderBy("source", "sample_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b)
    assert(a.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._3).sorted == Seq(1L, 2L, 3L, 4L, 5L) })
    // a different salt draws a different sample
    val c = graft.ext.Sampling.stratifiedSample(df, "source", "doc_id", 5, salt = "other")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(c != a.map(r => (r._1, r._2)).toSet)
  }

  test("topPaths: time order with id tie-break, slice at steps, count desc") {
    val ev = Seq(
      (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "click"),
      (2L, ts(1), 3L, "view"), (2L, ts(2), 4L, "click"),
      (3L, ts(5), 5L, "error"),
      // u4: same ts — event_id breaks the tie (6 before 7)
      (4L, ts(1), 6L, "view"), (4L, ts(1), 7L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ext.Events.topPaths(ev, "user_id", "ts", "event_id",
        "event_type", steps = 2, topN = 3)
      .orderBy("rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("view>click", 3L, 1L), ("error", 1L, 2L)))
  }

  test("transitionMatrix: ordered pairs, tie-break, row-normalized probabilities") {
    val ev = Seq(
      (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "click"), (1L, ts(3), 3L, "view"),
      (2L, ts(1), 4L, "view"), (2L, ts(2), 5L, "click"), (2L, ts(3), 6L, "purchase"),
      // u3: same ts — event_id orders (view before click)
      (3L, ts(1), 7L, "view"), (3L, ts(1), 8L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ext.Events.transitionMatrix(ev, "user_id", "ts", "event_id", "event_type")
      .orderBy("event_type", "next_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq(
      ("click", "purchase", 1L, 0.5),
      ("click", "view", 1L, 0.5),
      ("view", "click", 3L, 1.0)))
  }

  test("rollingAnomalyFlags: spike flagged, constants and gentle drift are not") {
    // trailing-7 window, kSq=4 (2σ): a flat series never flags (var = 0 and
    // x = mean); a 10× spike flags exactly at the spike row
    val base = (0L until 20L).map(d => (d, 100000L)).toMap + (12L -> 1000000L)
    val df = base.toSeq.toDF("day", "cents")
    val got = graft.ext.TimeSeries.rollingAnomalyFlags(df, "day", "cents")
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSeq
    // scala reference with BigInt — same algebra, no division
    val ordered = base.toSeq.sortBy(_._1)
    val want = ordered.zipWithIndex.map { case ((d, x), i) =>
      val frame = ordered.slice(math.max(0, i - 6), i + 1).map(_._2).map(BigInt(_))
      val n = BigInt(frame.size); val s = frame.sum; val q = frame.map(v => v * v).sum
      (d, frame.size.toLong, (n * x - s).pow(2) > 4 * (n * q - s * s))
    }
    assert(got == want)
    assert(got.count(_._3) == 1 && got.find(_._3).get._1 == 12L)
    // the spike also drags the window's variance up afterwards: day 13's
    // value is NOT flagged against the inflated frame
    assert(!got.find(_._1 == 13L).get._3)
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

  test("peakConcurrency: half-open intervals, day clamp, per-type sweep") {
    def at(h: Int, m: Int) = new Timestamp(((h * 60L + m) * 60L) * 1000L)
    val ev = Seq(
      // type a, day 0: [10:00,11:00) and [10:30,11:00) overlap → 2;
      // [11:00,11:01) starts exactly as both end → NOT concurrent (half-open)
      (1L, at(10, 0), "a", 3600L), (2L, at(10, 30), "a", 1800L),
      (3L, at(11, 0), "a", 60L),
      // type a, day 1: one interval opening at 23:50 day 0 is clamped to the
      // day-0 boundary, so day 1 holds only its own event → peak 1 each day
      (4L, at(23, 50), "a", 7200L), (5L, at(24, 10), "a", 60L),
      // type b never overlaps a: same instants, separate sweep
      (6L, at(10, 0), "b", 3600L), (7L, at(12, 0), "b", 60L)
    ).toDF("event_id", "ts", "event_type", "dur")
    val out = Events.peakConcurrency(ev, "event_type", "ts", "event_id",
        durSecs = col("dur"), epoch = "1970-01-01")
      .orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("a", 0L, 2L), ("a", 1L, 1L), ("b", 0L, 1L)))
  }

  test("activityStreaks: islands split on gaps, longest/count/total per user") {
    def t(day: Int, h: Int) = new Timestamp(86400000L * day + 3600000L * h)
    val ev = Seq(
      // u1 active days {0,1,2, 5,6, 9} → streaks 3+2+1
      (1L, t(0, 1)), (1L, t(0, 9)), (1L, t(1, 2)), (1L, t(2, 3)),
      (1L, t(5, 4)), (1L, t(6, 5)), (1L, t(9, 6)),
      // u2 active one day only
      (2L, t(4, 1))
    ).toDF("user_id", "ts")
    val out = Events.activityStreaks(ev, "user_id", "ts", "1970-01-01")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, 3L, 3L, 6L), (2L, 1L, 1L, 1L)))
  }

  test("lastTouchAttribution: most recent prior touch wins; no touch → (none)") {
    val ev = Seq(
      // u1: view@1 click@2 purchase@3 → attributed to click (most recent)
      (1L, ts(1), "view", 0.0), (2L, ts(2), "click", 0.0),
      (3L, ts(3), "purchase", 10.10),
      // u1 again: purchase@4 attributes to click@2 still (no newer touch)
      (4L, ts(4), "purchase", 5.15),
      // u2: purchase with NO prior event → (none); a LATER view must not count
      (5L, ts(1), "purchase", 2.00), (6L, ts(2), "view", 0.0),
      // u3: purchase then purchase — an earlier purchase is not a touch
      (7L, ts(1), "purchase", 1.00)
    ).map { case (id, t, ty, v) =>
      (id, if (id <= 4) 1L else if (id <= 6) 2L else 3L, t, ty, v)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.lastTouchAttribution(ev, "user_id", "ts", "event_id",
        "event_type", "value", target = "purchase")
      .orderBy("attributed_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString)).toSeq
    assert(out == Seq(("(none)", 2L, "3.00"), ("click", 2L, "15.25")))
  }

  test("cooccurrenceLift: basket counts and the independence ratio") {
    def t(day: Int) = new Timestamp(86400000L * day)
    // baskets: (u1,d0)={a,b}, (u1,d1)={a}, (u2,d0)={b} → N=3, na=2, nb=2, co=1
    val ev = Seq(
      (1L, t(0), "a"), (1L, t(0), "b"), (1L, t(0), "a"), // dup a same day
      (1L, t(1), "a"), (2L, t(0), "b")
    ).toDF("user_id", "ts", "event_type")
    val out = Events.cooccurrenceLift(ev, "user_id", "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(out == Seq(("a", "b", 1L, 2L, 2L, 3.0 / 4.0)))
  }
}
