package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}

class StreamingSessionSpec extends SparkSpec {
  import spark.implicits._

  // offset from epoch: an event AT the initial watermark (epoch 0) would be
  // dropped as late data by the stateful operator
  private def ts(minutes: Int): Timestamp = new Timestamp((60 + minutes) * 60000L)

  test("batch sessionization: gap splits sessions per user") {
    val events = Seq(
      Event(1, ts(0), "a"), Event(1, ts(10), "b"), Event(1, ts(60), "c"),
      Event(2, ts(5), "x")).toDS()
    val out = Sessionize.sessionize(spark, events, gapMillis = 30 * 60000L)
      .collect()
    // batch mode: open sessions are not emitted (stream semantics); only
    // user 1's first session closed via the 60-minute gap
    assert(out.toSeq == Seq(Session(1, ts(0), ts(10), 2, closed = true)))
  }

  test("cross-batch late event within the gap extends the session START backwards") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessionize(
      spark,
      input.toDS().withWatermark("ts", "2 hours").as[Event],
      gapMillis = 30 * 60000L)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_late")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Event(1, ts(60), "a"))
      q.processAllAvailable()
      input.addData(Event(1, ts(45), "late")) // 15 min BEFORE the session, within gap
      q.processAllAvailable()
      input.addData(Event(1, ts(600), "c")) // watermark to 08:00 — closes [45,60]
      q.processAllAvailable()
      input.addData(Event(2, ts(660), "z")) // extra batch so timeouts fire
      q.processAllAvailable()
      val closed = spark.table("sessions_late").as[Session].collect()
      assert(closed.exists(s => s.userId == 1 && s.nEvents == 2 &&
        s.start == ts(45) && s.end == ts(60)),
        s"expected [45,60] n=2, got ${closed.toSeq}")
    } finally q.stop()
  }

  test("cross-batch event beyond the gap BEFORE the session forms its own closed session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessionize(
      spark,
      input.toDS().withWatermark("ts", "4 hours").as[Event],
      gapMillis = 30 * 60000L)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_straggler")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Event(1, ts(100), "a"))
      q.processAllAvailable()
      input.addData(Event(1, ts(0), "straggler")) // 100 min earlier — NOT mergeable
      q.processAllAvailable()
      val closed = spark.table("sessions_straggler").as[Session].collect()
      // the straggler is its own session, closed immediately (a later event
      // exists); the [100,100] session stays open — and is NOT corrupted
      assert(closed.toSeq == Seq(Session(1, ts(0), ts(0), 1, closed = true)),
        s"got ${closed.toSeq}")
    } finally q.stop()
  }

  test("streaming sessionization with event-time timeout closes sessions via watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessionize(
      spark,
      input.toDS().withWatermark("ts", "0 seconds").as[Event],
      gapMillis = 30 * 60000L)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Event(1, ts(0), "a"), Event(1, ts(10), "b"))
      q.processAllAvailable()
      // watermark = 00:10; session (end 00:10 + 30min gap) not yet closed
      assert(spark.table("sessions_out").count() == 0)
      input.addData(Event(1, ts(120), "c")) // advances watermark to 02:00
      q.processAllAvailable()
      input.addData(Event(2, ts(180), "z")) // one more batch so timeouts fire
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[Session].collect()
      assert(closed.exists(s => s.userId == 1 && s.nEvents == 2 &&
        s.start == ts(0) && s.end == ts(10)))
    } finally q.stop()
  }
}
