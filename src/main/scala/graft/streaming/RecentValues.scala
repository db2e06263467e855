package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Per-key LIST state on `transformWithState` — the last of the four
  * state primitives ([[RunningTotals]] ValueState, [[TypeCounts]]
  * MapState, [[TimedSessions]] timers): a per-user sliding window of the
  * LAST 3 event values in (ts, event_id) order, emitting the window sum
  * after every touched batch.
  *
  * ListState is the right container for a bounded recency window:
  * appends are cheap (no read-modify-write of a whole blob), and the
  * trim rewrites at most `keep` elements. Batch rows are sorted by
  * (ts, event_id) before appending and the trim re-sorts defensively,
  * so the retained window is the GLOBAL last-3 by that total order as
  * long as batches arrive time-ordered (the pinned-chunk contract every
  * streaming oracle here already relies on).
  *
  * Emissions carry `nSeen` (cumulative events for the key — strictly
  * monotonic per touched batch), so "the row with max nSeen per key" is
  * the final window regardless of chunking — the arg-max flavor of the
  * [[RunningTotals]] oracle identity.
  */
object RecentValues {

  final case class In(userId: Long, eventId: Long, tsUs: Long, cents: Long)
  final case class Item(tsUs: Long, eventId: Long, cents: Long)
  final case class Out(userId: Long, nSeen: Long, n3: Int, sum3: Long)

  class Processor(keep: Int) extends StatefulProcessor[Long, In, Out] {
    @transient private var recent: org.apache.spark.sql.streaming.ListState[Item] = _
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      recent = getHandle.getListState[Item](
        "recent", Encoders.product[Item], TTLConfig.NONE)
      seen = getHandle.getValueState[Long](
        "seen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[In], timers: TimerValues): Iterator[Out] = {
      val batch = rows.toArray.sortBy(r => (r.tsUs, r.eventId))
      // only the batch's own last-`keep` can survive the trim (any other
      // batch row already has >= keep rows above it), so append just
      // those — the state-update work per key is O(keep), not O(batch)
      // (dev/DRAIN_PROFILE.md round-12: updates are the drain's dominant
      // per-batch cost)
      batch.takeRight(keep).foreach(r => recent.appendValue(Item(r.tsUs, r.eventId, r.cents)))
      val window = recent.get().toArray
        .sortBy(i => (i.tsUs, i.eventId)).takeRight(keep)
      recent.put(window)
      val n = (if (seen.exists()) seen.get() else 0L) + batch.length
      seen.update(n)
      Iterator.single(Out(key, n, window.length, window.map(_.cents).sum))
    }
  }

  /** Wire the processor onto a keyed stream of [[In]] rows. */
  def apply(ds: Dataset[In], keep: Int = 3): Dataset[Out] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.userId)
      .transformWithState(new Processor(keep), TimeMode.None(), OutputMode.Append())
  }
}
