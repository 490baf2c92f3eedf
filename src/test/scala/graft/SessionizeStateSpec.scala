package graft

import java.sql.Timestamp
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite
import graft.stream.Sessionize
import graft.stream.Sessionize.{Ev, OpenSess, SessState, Session}

/** The sessionization state machine, driven directly through
  * `TestGroupState`: state is O(1) per user (counter + open tuple, never the
  * event history), gap timeouts close-and-evict the open session keeping
  * only the counter, the counter TTL evicts down to a restart-epoch
  * tombstone, and session numbering stays monotonic for late-returning
  * users — across epochs too, since post-TTL ids are namespaced by
  * `epoch * 2^32` and can never collide with ids already emitted.
  */
class SessionizeStateSpec extends AnyFunSuite {

  private def ts(ms: Long) = new Timestamp(ms)
  private val Gap = Sessionize.GapMs

  private def freshState(watermarkMs: Long = 0L, timedOut: Boolean = false,
                         prior: Option[SessState] = None): TestGroupState[SessState] =
    TestGroupState.create[SessState](
      prior.map(Optional.of[SessState]).getOrElse(Optional.empty[SessState]()),
      GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(watermarkMs), timedOut)

  test("state stays O(1) under many events; open session emitted with running totals") {
    val state = freshState()
    val n = 10000
    val evs = (1 to n).map(i => Ev(1L, ts(i * 1000L))) // 1s apart — one session
    val out = Sessionize.update(1L, evs.iterator, state).toSeq
    // state holds exactly the counter + the open tuple — not the 10k events
    assert(state.get == SessState(1L, Some(OpenSess(1L, 1000L, n * 1000L, n.toLong))))
    assert(out == Seq(Session(1L, 1L, n.toLong, ts(1000L), ts(n * 1000L))))
    assert(state.getTimeoutTimestampMs.get() == n * 1000L + Gap)
  }

  test("in-batch gap closes the first session and opens a numbered successor") {
    val state = freshState()
    val evs = Seq(Ev(7L, ts(1000L)), Ev(7L, ts(2000L)), Ev(7L, ts(2000L + Gap + 1)))
    val out = Sessionize.update(7L, evs.iterator, state).toSeq
    assert(out == Seq(
      Session(7L, 1L, 2L, ts(1000L), ts(2000L)),
      Session(7L, 2L, 1L, ts(2000L + Gap + 1), ts(2000L + Gap + 1))))
    assert(state.get == SessState(2L, Some(OpenSess(2L, 2000L + Gap + 1, 2000L + Gap + 1, 1L))))
  }

  test("within-gap late event folds into the open session") {
    val prior = SessState(1L, Some(OpenSess(1L, 100000L, 200000L, 2L)))
    val state = freshState(watermarkMs = 0L, prior = Some(prior))
    val out = Sessionize.update(1L, Iterator(Ev(1L, ts(150000L))), state).toSeq
    assert(state.get == SessState(1L, Some(OpenSess(1L, 100000L, 200000L, 3L))))
    assert(out == Seq(Session(1L, 1L, 3L, ts(100000L), ts(200000L))))
  }

  test("gap timeout emits the closed session and keeps only the counter") {
    val prior = SessState(3L, Some(OpenSess(3L, 1000L, 5000L, 4L)))
    val state = freshState(watermarkMs = 5000L + Gap + 1, timedOut = true, prior = Some(prior))
    val out = Sessionize.update(9L, Iterator.empty, state).toSeq
    assert(out == Seq(Session(9L, 3L, 4L, ts(1000L), ts(5000L))))
    assert(state.get == SessState(3L, None)) // event data evicted
    assert(state.getTimeoutTimestampMs.get() == 5000L + Sessionize.CounterTtlMs)
  }

  test("counter TTL evicts the counter, leaving only the restart tombstone") {
    val state = freshState(watermarkMs = Sessionize.CounterTtlMs + 1, timedOut = true,
      prior = Some(SessState(3L, None)))
    val out = Sessionize.update(9L, Iterator.empty, state).toSeq
    assert(out.isEmpty)
    assert(state.get == SessState(0L, None, 1L))
    assert(!state.getTimeoutTimestampMs.isPresent) // tombstone never times out
  }

  test("TTL-evicted user returns under the next epoch: no (user, session_id) collision") {
    // epoch-1 tombstone left by the counter TTL; the user's epoch-0 history
    // was emitted under plain counter ids 1..3
    val state = freshState(watermarkMs = 1000L, prior = Some(SessState(0L, None, 1L)))
    val t = 100L * Gap
    val out = Sessionize.update(4L, Iterator(Ev(4L, ts(t))), state).toSeq
    val sid = Sessionize.EpochStride + 1L // epoch 1, counter 1
    assert(out == Seq(Session(4L, sid, 1L, ts(t), ts(t))))
    assert(state.get == SessState(1L, Some(OpenSess(sid, t, t, 1L)), 1L))
    // a second TTL cycle advances the epoch again
    val state2 = freshState(watermarkMs = t + Sessionize.CounterTtlMs + 1, timedOut = true,
      prior = Some(SessState(1L, None, 1L)))
    Sessionize.update(4L, Iterator.empty, state2)
    assert(state2.get == SessState(0L, None, 2L))
  }

  /** Replay time-contiguous chunks through the state machine, upserting
    * emissions by session_id (what the snapshot sink does); optionally fire
    * the event-time timeout between chunks whenever the gap has elapsed —
    * the AvailableNow-with-tight-watermark schedule. */
  private def replay(chunks: Seq[Seq[Long]], fireTimeouts: Boolean): Seq[Session] = {
    val emitted = scala.collection.mutable.Map.empty[Long, Session]
    var st: Option[SessState] = None
    var watermark = 0L
    chunks.foreach { chunk =>
      if (fireTimeouts) st.flatMap(_.open).foreach { o =>
        if (chunk.nonEmpty && chunk.min - o.last > Gap) {
          watermark = o.last + Gap + 1
          val s = freshState(watermark, timedOut = true, prior = st)
          Sessionize.update(1L, Iterator.empty, s)
            .foreach(x => emitted(x.session_id) = x)
          st = if (s.isRemoved) None else s.getOption
        }
      }
      val s = freshState(watermark, prior = st)
      Sessionize.update(1L, chunk.map(t => Ev(1L, ts(t))).iterator, s)
        .foreach(x => emitted(x.session_id) = x)
      st = if (s.isRemoved) None else s.getOption
    }
    emitted.values.toSeq.sortBy(_.session_id)
  }

  test("property: any time-ordered chunked replay ≡ batch sessionsOf") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(1, 40)
      times <- Gen.listOfN(n, Gen.choose(0L, 12L * Gap))
      nCuts <- Gen.choose(0, 4)
      cuts <- Gen.listOfN(nCuts, Gen.choose(0, n))
      withTimeouts <- Gen.oneOf(true, false)
    } yield (times.sorted, cuts.sorted, withTimeouts)
    val prop = Prop.forAll(gen) { case (sorted, cuts, withTimeouts) =>
      val bounds = (0 +: cuts :+ sorted.length).distinct.sorted
      val chunks = bounds.zip(bounds.tail).map { case (a, b) => sorted.slice(a, b) }
      val streamed = replay(chunks, withTimeouts)
      val batch = Sessionize.sessionsOf(1L, sorted)
      streamed == batch
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("stragglers older than open.start - gap become their own closed sessions; open keeps its id") {
    val openStart = 10L * Gap
    val prior = SessState(2L, Some(OpenSess(2L, openStart, openStart + 1000L, 2L)))
    val state = freshState(watermarkMs = 0L, prior = Some(prior))
    // 1000/2000 gap-split from 3*Gap → two straggler sessions, both far
    // before the open session's reach
    val out = Sessionize.update(1L,
      Iterator(Ev(1L, ts(1000L)), Ev(1L, ts(2000L)), Ev(1L, ts(3L * Gap))), state).toSeq
    assert(out == Seq(
      Session(1L, 3L, 2L, ts(1000L), ts(2000L)),       // straggler pair, fresh id
      Session(1L, 4L, 1L, ts(3L * Gap), ts(3L * Gap)), // lone straggler, fresh id
      Session(1L, 2L, 2L, ts(openStart), ts(openStart + 1000L)))) // open, id kept
    // open session untouched; counter advanced past the straggler ids
    assert(state.get == SessState(4L, Some(OpenSess(2L, openStart, openStart + 1000L, 2L))))
  }

  test("event exactly gap-before open.start still folds (boundary is strict)") {
    val openStart = 10L * Gap
    val prior = SessState(1L, Some(OpenSess(1L, openStart, openStart, 1L)))
    val state = freshState(watermarkMs = 0L, prior = Some(prior))
    val out = Sessionize.update(1L, Iterator(Ev(1L, ts(openStart - Gap))), state).toSeq
    // batch twin folds an event within one gap of the session start
    assert(out == Seq(Session(1L, 1L, 2L, ts(openStart - Gap), ts(openStart))))
    assert(state.get == SessState(1L, Some(OpenSess(1L, openStart - Gap, openStart, 2L))))
  }

  test("property: out-of-order chunk replay conserves every event exactly once") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(1, 40)
      times <- Gen.listOfN(n, Gen.choose(0L, 12L * Gap))
      nCuts <- Gen.choose(0, 4)
      cuts <- Gen.listOfN(nCuts, Gen.choose(0, n))
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (times.sorted, cuts.sorted, seed)
    val prop = Prop.forAll(gen) { case (sorted, cuts, seed) =>
      val bounds = (0 +: cuts :+ sorted.length).distinct.sorted
      val chunks = bounds.zip(bounds.tail).map { case (a, b) => sorted.slice(a, b) }
      // deliver chunks in a shuffled order — cross-batch stragglers of any
      // age; no event may be dropped, double-counted, or silently folded
      val shuffled = new scala.util.Random(seed).shuffle(chunks)
      val streamed = replay(shuffled, fireTimeouts = false)
      streamed.map(_.n_events).sum == sorted.length.toLong &&
        streamed.forall(s => s.session_start.getTime <= s.session_end.getTime)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("late-returning user continues session numbering from the counter") {
    val state = freshState(watermarkMs = 1000L, prior = Some(SessState(5L, None)))
    val t = 10L * Gap
    val out = Sessionize.update(4L, Iterator(Ev(4L, ts(t))), state).toSeq
    assert(out == Seq(Session(4L, 6L, 1L, ts(t), ts(t))))
    assert(state.get == SessState(6L, Some(OpenSess(6L, t, t, 1L))))
  }
}
