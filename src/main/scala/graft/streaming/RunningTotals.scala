package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Arbitrary stateful streaming on the Spark 4.x `transformWithState`
  * API (the `StatefulProcessor` successor to `mapGroupsWithState` —
  * typed composite state, timers, TTL; this repo's [[Sessionize]] covers
  * the legacy API, this covers the new one): a per-key running
  * (count, sum) that emits ONE cumulative row per key per micro-batch
  * touched.
  *
  * Emissions are deterministic regardless of how the stream is chunked
  * into batches: each emitted row carries the key's cumulative totals so
  * far, so the MAX per key over all emissions equals the batch-mode
  * aggregate — the oracle identity `q_transform_state` pins. State is
  * one `ValueState[(Long, Long)]` per key in the state store (RocksDB
  * or default provider), nothing driver-side.
  */
object RunningTotals {

  /** (key, increment) input; cumulative (key, n, total) output. */
  final case class In(k: Long, inc: Long)
  final case class Out(k: Long, n: Long, total: Long)

  class Processor extends StatefulProcessor[Long, In, Out] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)](
        "totals", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[In], timers: TimerValues): Iterator[Out] = {
      var (n, s) = if (state.exists()) state.get() else (0L, 0L)
      rows.foreach { r => n += 1; s += r.inc }
      state.update((n, s))
      Iterator.single(Out(key, n, s))
    }
  }

  /** Wire the processor onto a keyed stream of [[In]] rows. */
  def apply(ds: Dataset[In]): Dataset[Out] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.k)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
