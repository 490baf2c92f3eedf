package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful-streaming sessionization via `flatMapGroupsWithState` — the
  * custom-state tier of Structured Streaming (SURVEY.md §2.9 / builder
  * spec). Batch twin: q41 (AdvancedJoinQueries.q41Sessionize); the spec
  * asserts both produce identical sessions.
  *
  * Scale design — state is O(1) per user, never O(events): only the OPEN
  * session's (start, last, n) tuple plus the session counter live in
  * `GroupState`. Sessions close either inline (a same-user event past the
  * gap) or via event-time timeout once the watermark passes last+gap; a
  * closed session is emitted and its event data dropped from state. After a
  * gap timeout only the 16-byte counter survives (so session numbering stays
  * monotonic for late-returning users) with a second, much longer TTL
  * timeout that removes the user's state entirely.
  *
  * Within-session late events (older than the open session's last event but
  * inside the gap) fold into the open session; events late enough to fall
  * behind the watermark are dropped by Spark before reaching the state
  * function — the standard streaming-sessionization contract.
  */
object Sessionize {

  case class Ev(user_id: Long, ts: Timestamp)
  case class Session(user_id: Long, session_id: Long, n_events: Long,
                     session_start: Timestamp, session_end: Timestamp)

  /** Open-session tuple — the only per-event-derived state kept. */
  case class OpenSess(start: Long, last: Long, n: Long)

  /** Per-user state: id of the current (or last closed) session + the open
    * session, if any. Fixed-size regardless of event count. */
  case class SessState(sid: Long, open: Option[OpenSess])

  val GapMs: Long = 30L * 60 * 1000

  /** How long an idle user's bare session counter is retained after the gap
    * timeout; when this TTL fires the user's state is removed entirely
    * (session numbering restarts only for users idle this long). */
  val CounterTtlMs: Long = 30L * 24 * 3600 * 1000

  /** Reference batch semantics: gap-split sessions of a sorted ts list —
    * used by q41's oracle-checked batch twin and by property tests. */
  def sessionsOf(userId: Long, timesMs: Seq[Long]): Seq[Session] = {
    val sorted = timesMs.sorted
    if (sorted.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    var sid = 0L
    var start = sorted.head
    var prev = sorted.head
    var n = 0L
    def close(end: Long): Unit = {
      sid += 1
      out += Session(userId, sid, n, new Timestamp(start), new Timestamp(end))
    }
    sorted.foreach { t =>
      if (t - prev > GapMs) {
        close(prev)
        start = t
        n = 0L
      }
      n += 1
      prev = t
    }
    close(prev)
    out.toSeq
  }

  /** The state-transition function (package-visible for direct unit tests
    * via `TestGroupState`). Emits every session whose membership changed
    * this invocation — closed sessions finally, the open session with its
    * running totals (Update mode: downstream upserts on (user, session_id)). */
  private[graft] def update(userId: Long, events: Iterator[Ev],
                            state: GroupState[SessState]): Iterator[Session] = {
    def emit(sid: Long, o: OpenSess): Session =
      Session(userId, sid, o.n, new Timestamp(o.start), new Timestamp(o.last))
    // timeouts must be strictly ahead of the watermark or Spark rejects them
    def armTimeout(atMs: Long): Unit =
      state.setTimeoutTimestamp(math.max(atMs, state.getCurrentWatermarkMs() + 1))

    if (state.hasTimedOut) {
      val s = state.get
      s.open match {
        case Some(o) =>
          // gap timeout: the open session is now closed; evict its data,
          // keep only the counter (with its own TTL) for stable numbering
          state.update(SessState(s.sid, None))
          armTimeout(o.last + CounterTtlMs)
          Iterator(emit(s.sid, o))
        case None =>
          state.remove() // counter TTL expired — full eviction
          Iterator.empty
      }
    } else {
      // bounded by the micro-batch (never the user's history)
      val times = events.map(_.ts.getTime).toArray.sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      val s0 = state.getOption.getOrElse(SessState(0L, None))
      var sid = s0.sid
      var open = s0.open
      times.foreach { t =>
        open match {
          case Some(o) if t - o.last > GapMs =>
            out += emit(sid, o) // closed by an in-batch gap
            sid += 1
            open = Some(OpenSess(t, t, 1L))
          case Some(o) =>
            open = Some(OpenSess(math.min(o.start, t), math.max(o.last, t), o.n + 1L))
          case None =>
            sid += 1
            open = Some(OpenSess(t, t, 1L))
        }
      }
      open match {
        case Some(o) =>
          state.update(SessState(sid, open))
          armTimeout(o.last + GapMs)
          out += emit(sid, o) // running totals of the still-open session
        case None => // batch carried no events (shouldn't happen outside timeout)
      }
      out.iterator
    }
  }

  /** Streaming sessionization over a parquet file stream of events
    * (AvailableNow); returns the snapshot of all sessions at stream end.
    *
    * The sink upserts each Update-mode emission on (user_id, session_id),
    * so re-emissions of a growing open session replace their prior row —
    * correct across any number of micro-batches (`maxFilesPerTrigger`
    * exercises this in IncrementalSpec). The driver-side map is snapshot
    * plumbing for tests/demos; production would foreachBatch-upsert into a
    * keyed store the same way.
    *
    * `watermarkDelay` bounds how late an event may be; the default is
    * generous so finite test data is never dropped. */
  def runToSnapshot(spark: SparkSession, eventsDir: String,
                    queryName: String = "sessions",
                    watermarkDelay: String = "30 days",
                    maxFilesPerTrigger: Option[Int] = None): Dataset[Session] = {
    import spark.implicits._
    val schema = spark.read.parquet(eventsDir).schema
    val reader = spark.readStream.schema(schema)
    val raw = maxFilesPerTrigger.fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(eventsDir)
    val events =
      (if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      else raw).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
        .withWatermark("ts", watermarkDelay)
        .as[Ev]
    val sessions = events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(update)
    val store = new java.util.concurrent.ConcurrentHashMap[(Long, Long), Session]()
    val q = sessions.writeStream
      .outputMode("update")
      .queryName(queryName)
      .foreachBatch { (batch: Dataset[Session], _: Long) =>
        batch.collect().foreach(s => store.put((s.user_id, s.session_id), s))
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    spark.createDataset(store.values.asScala.toSeq)
  }
}
