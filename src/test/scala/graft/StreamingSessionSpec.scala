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
