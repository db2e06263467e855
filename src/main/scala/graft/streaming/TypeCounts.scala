package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Per-key MAP state on `transformWithState` — the remaining state
  * primitive after [[RunningTotals]] (ValueState) and [[TimedSessions]]
  * (timers): a per-user map of event type → running count, emitting the
  * touched entries' cumulative counts each micro-batch.
  *
  * MapState is the right container here because the sub-key space
  * (event types) is unbounded at plan time: a ValueState[Map[...]] would
  * rewrite the WHOLE map per update (serialization cost proportional to
  * map size), while MapState reads and writes only the touched sub-keys
  * — constant work per event at any map width, the property that matters
  * when the sub-key is a high-cardinality dimension instead of a handful
  * of event types.
  *
  * Emissions carry cumulative counts, so MAX per (user, type) over all
  * emissions equals the batch-mode aggregate — the same chunking-
  * independent oracle identity as [[RunningTotals]].
  */
object TypeCounts {

  final case class In(userId: Long, eventType: String)
  final case class Out(userId: Long, eventType: String, n: Long)

  class Processor extends StatefulProcessor[Long, In, Out] {
    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "typeCounts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[In], timers: TimerValues): Iterator[Out] = {
      // aggregate the batch locally first: one state read+write per
      // touched type, not per event
      val batch = scala.collection.mutable.Map.empty[String, Long]
      rows.foreach(r => batch.update(r.eventType, batch.getOrElse(r.eventType, 0L) + 1L))
      // deterministic emission order (state-store iteration order is not
      // part of the contract)
      batch.toSeq.sortBy(_._1).iterator.map { case (et, inc) =>
        val total = (if (counts.containsKey(et)) counts.getValue(et) else 0L) + inc
        counts.updateValue(et, total)
        Out(key, et, total)
      }
    }
  }

  /** Wire the processor onto a keyed stream of [[In]] rows. */
  def apply(ds: Dataset[In]): Dataset[Out] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.userId)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
