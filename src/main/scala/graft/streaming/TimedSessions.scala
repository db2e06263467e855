package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Gap-based sessionization on the Spark 4.x `transformWithState` TIMER
  * surface — the third leg of the custom-state streaming coverage:
  * [[Sessionize]] is the legacy `flatMapGroupsWithState` + event-time
  * timeout, [[RunningTotals]] is `StatefulProcessor` ValueState without
  * time, and this is `StatefulProcessor` + event-time TIMERS
  * (`registerTimer` / `handleExpiredTimer`), the API a production
  * session pipeline on Spark 4 actually uses.
  *
  * Semantics are IDENTICAL to [[Sessionize]] (same interval-island fold,
  * same watermark clamp), so the two implementations are mutually
  * checking: sessions closed by a later event emit from
  * `handleInputRows`, the trailing open session emits from
  * `handleExpiredTimer` once the watermark passes `end + gap`. Exactly
  * one timer is armed per key (the previous one is deleted on re-arm —
  * stale timers firing on an already-extended session would double-emit).
  *
  * State per key is one fixed-size (start, end, n) triple plus one
  * timer — bounded regardless of session length or stream size; the
  * required RocksDB state store keeps it off-heap.
  */
object TimedSessions {

  final case class Event(userId: Long, ts: Timestamp)
  final case class SessionState(start: Long, end: Long, nEvents: Int)
  final case class Session(userId: Long, start: Timestamp, end: Timestamp, nEvents: Int)

  class Processor(gapMillis: Long) extends StatefulProcessor[Long, Event, Session] {
    @transient private var open: org.apache.spark.sql.streaming.ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessionState](
        "open", Encoders.product[SessionState], TTLConfig.NONE)

    private def rearm(timers: TimerValues, end: Long): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      // a late event can extend a session whose end+gap is at/behind the
      // watermark — clamp forward so the timer is still in the future and
      // fires on the next sweep (the Sessionize clamp, same reason)
      getHandle.registerTimer(
        math.max(end + gapMillis, timers.getCurrentWatermarkInMs() + 1))
    }

    override def handleInputRows(
        key: Long, rows: Iterator[Event], timers: TimerValues): Iterator[Session] = {
      // the Sessionize island fold: stored session + batch events as
      // intervals, sorted by start, neighbors within the gap merged —
      // correct for late events landing BEFORE the stored session too
      val intervals = ((if (open.exists()) List(open.get()) else Nil) ++
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
        case stillOpen :: closedRev =>
          open.update(stillOpen)
          rearm(timers, stillOpen.end)
          closedRev.reverseIterator.map(s =>
            Session(key, new Timestamp(s.start), new Timestamp(s.end), s.nEvents))
      }
    }

    override def handleExpiredTimer(
        key: Long, timers: TimerValues, info: ExpiredTimerInfo): Iterator[Session] = {
      if (!open.exists()) return Iterator.empty
      val s = open.get()
      if (info.getExpiryTimeInMs() >= s.end + gapMillis) {
        // watermark passed end+gap: the session is final
        open.clear()
        Iterator.single(Session(key, new Timestamp(s.start), new Timestamp(s.end), s.nEvents))
      } else Iterator.empty // stale timer from before a late-event extension
    }
  }

  /** Wire the processor onto a keyed event stream (requires a watermark
    * on the source and the RocksDB state store provider). */
  def apply(ds: Dataset[Event], gapMillis: Long): Dataset[Session] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.userId)
      .transformWithState(new Processor(gapMillis), TimeMode.EventTime(),
        OutputMode.Append())
  }
}
