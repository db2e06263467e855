package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via `flatMapGroupsWithState` — the
  * custom-state half of the streaming surface (SURVEY.md §2B streaming row;
  * `session_window` covers the declarative half).
  *
  * Emits one [[Session]] row per closed session: a session closes when no
  * event arrives for `gapMillis` (event-time, driven by the watermark).
  * In batch mode only sessions closed by a LATER event are emitted — the
  * trailing open session per user stays unemitted (identical to streaming
  * semantics, where it would still be awaiting its timeout).
  */
object Sessionize {

  final case class Event(userId: Long, ts: Timestamp, eventType: String)
  final case class SessionState(start: Long, end: Long, nEvents: Int)
  final case class Session(userId: Long, start: Timestamp, end: Timestamp, nEvents: Int, closed: Boolean)

  def sessionize(
      spark: SparkSession,
      events: Dataset[Event],
      gapMillis: Long): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed session end + gap: close and emit
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.nEvents, closed = true))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMillis =>
                  cur = Some(s.copy(end = math.max(s.end, t), nEvents = s.nEvents + 1))
                case Some(s) => // gap exceeded: close previous, open new
                  closed ::= Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.nEvents, closed = true)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (!state.hasTimedOut) {
                try {
                  // A late event can extend a session whose end+gap is already
                  // at/behind the watermark; Spark rejects timeouts <= watermark
                  // (IllegalArgumentException), so clamp to watermark+1 — the
                  // session then closes on the very next timeout sweep.
                  val wm = try state.getCurrentWatermarkMs() catch { case _: Exception => Long.MinValue }
                  state.setTimeoutTimestamp(math.max(s.end + gapMillis, wm + 1))
                } catch { case _: UnsupportedOperationException => () } // batch mode: no timeouts
              }
            }
            closed.reverseIterator
          }
      }
  }
}
