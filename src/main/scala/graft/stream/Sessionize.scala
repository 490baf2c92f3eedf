package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful-streaming sessionization via `flatMapGroupsWithState` — the
  * custom-state tier of Structured Streaming (SURVEY.md §2.9 / builder
  * spec). Batch twin: q41 (AdvancedJoinQueries.q41Sessionize); the spec
  * asserts both produce identical sessions.
  *
  * State is the per-user event-time list; each invocation merges the new
  * micro-batch, recomputes the gap-split sessions, and (Update mode) emits
  * the user's current session list. A production deployment would use
  * event-time timeout to emit closed sessions and evict state; the plumbing
  * (typed state, group iterator, output mode) is identical.
  */
object Sessionize {

  case class Ev(user_id: Long, ts: Timestamp)
  case class Session(user_id: Long, session_id: Long, n_events: Long,
                     session_start: Timestamp, session_end: Timestamp)

  val GapMs: Long = 30L * 60 * 1000

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

  private def update(userId: Long, events: Iterator[Ev],
                     state: GroupState[Seq[Long]]): Iterator[Session] = {
    val merged = state.getOption.getOrElse(Nil) ++ events.map(_.ts.getTime)
    state.update(merged)
    sessionsOf(userId, merged).iterator
  }

  /** Streaming sessionization over a parquet file stream of events
    * (AvailableNow); returns the snapshot table of emitted sessions. */
  def runToSnapshot(spark: SparkSession, eventsDir: String,
                    queryName: String = "sessions"): Dataset[Session] = {
    import spark.implicits._
    val schema = spark.read.parquet(eventsDir).schema
    val raw = spark.readStream.schema(schema).parquet(eventsDir)
    val events =
      (if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      else raw).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts").as[Ev]
    val sessions = events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
    val q = sessions.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName).as[Session]
  }
}
