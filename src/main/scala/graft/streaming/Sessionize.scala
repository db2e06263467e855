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
            // Fold the stored session and this batch's events into
            // gap-separated islands: sort INTERVALS by start, merge
            // neighbors closer than the gap. Unlike an end-only append,
            // this is correct for cross-batch late events that land
            // BEFORE the stored session — within the gap they extend its
            // START backwards, beyond the gap they form their own earlier
            // (immediately closed) session instead of being absorbed.
            val intervals = (state.getOption.toList ++
                rows.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1)))
              .sortBy(s => (s.start, s.end))
            val mergedRev = intervals.foldLeft(List.empty[SessionState]) {
              case (head :: tail, iv) if iv.start - head.end <= gapMillis =>
                SessionState(head.start, math.max(head.end, iv.end),
                  head.nEvents + iv.nEvents) :: tail
              case (acc, iv) => iv :: acc
            }
            mergedRev match {
              case Nil => Iterator.empty
              case open :: closedRev =>
                state.update(open)
                try {
                  // A late event can extend a session whose end+gap is already
                  // at/behind the watermark; Spark rejects timeouts <= watermark
                  // (IllegalArgumentException), so clamp to watermark+1 — the
                  // session then closes on the very next timeout sweep.
                  val wm = try state.getCurrentWatermarkMs() catch { case _: Exception => Long.MinValue }
                  state.setTimeoutTimestamp(math.max(open.end + gapMillis, wm + 1))
                } catch { case _: UnsupportedOperationException => () } // batch mode: no timeouts
                closedRev.reverseIterator.map(s =>
                  Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.nEvents, closed = true))
            }
          }
      }
  }
}
