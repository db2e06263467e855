package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.log.{LogFrame, LogOptions}

/** The expression-only path (ParseLogLine + pure column ops) must agree with
  * the DSV2 reader on the same input — and work under Structured Streaming.
  */
class LogFrameSpec extends SparkSpec {

  private val mysqlOpts = Map(
    "pattern" -> "(\\d{6})\\s(\\d{2}:\\d{2}:\\d{2})\\s+(\\d+)\\s(\\w+)\\s+(.+)",
    "fieldNames" -> "date, time, pid, action, query",
    "dataTypes" -> "DATE, TIME, INT, VARCHAR, VARCHAR",
    "dateFormat" -> "yyMMdd",
    "timeFormat" -> "HH:mm:ss")

  test("LogFrame.parse agrees with the DSV2 source on mysql.log") {
    val viaSource = spark.read.format("log").options(mysqlOpts)
      .load(fixture("mysql.log")).orderBy("time", "pid").collect().toSeq
    val viaFrame = LogFrame.parse(
      spark.read.text(fixture("mysql.log")), LogOptions.fromMap(mysqlOpts))
      .orderBy("time", "pid").collect().toSeq
    assert(viaFrame == viaSource)
  }

  test("ParseLogLine: one-pass groups array, null on no-match, null element for absent group") {
    import spark.implicits._
    val df = Seq("a=1 b=2", "zzz", "a=9").toDF("value")
      .select(LogFrame.parseLogLine(col("value"), "a=(\\d+)( b=(\\d+))?").as("g"))
    val rows = df.collect().map(r => Option(r.getSeq[String](0)))
    assert(rows(0).get == Seq("1", " b=2", "2"))
    assert(rows(1).isEmpty)
    assert(rows(2).get == Seq("9", null, null))
  }

  test("ParseLogLine survives codegen (wholestage) and interpreted paths equally") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => s"req id=$i dur=${i * 2}ms").toDF("value")
    val out = df.select(
      element_at(LogFrame.parseLogLine(col("value"), "id=(\\d+) dur=(\\d+)ms"), 1)
        .cast("int").as("id"),
      element_at(LogFrame.parseLogLine(col("value"), "id=(\\d+) dur=(\\d+)ms"), 2)
        .cast("int").as("dur"))
    assert(out.agg(sum("id"), sum("dur")).collect().head.toSeq == Seq(4950, 9900))
  }

  test("expression path rejects options it cannot honor (framing, error modes)") {
    import spark.implicits._
    val lines = Seq("a 1").toDF("value")
    val framing = intercept[IllegalArgumentException](LogFrame.parse(lines,
      LogOptions.fromMap(Map("pattern" -> "(\\w+) (\\d+)",
        "recordStartPattern" -> "^\\w"))))
    assert(framing.getMessage.contains("recordStartPattern"))
    val mode = intercept[IllegalArgumentException](LogFrame.parse(lines,
      LogOptions.fromMap(Map("pattern" -> "(\\w+) (\\d+)", "mode" -> "FAILFAST"))))
    assert(mode.getMessage.contains("PERMISSIVE"))
  }

  test("streaming: readStream.text + LogFrame.parse with windowed aggregation") {
    val dir = java.nio.file.Files.createTempDirectory("logstream").toFile
    val f = new java.io.File(dir, "app.log")
    java.nio.file.Files.writeString(f.toPath,
      (0 until 20).map(i => f"070823 21:${i / 2}%02d:00       $i Query       q$i").mkString("\n"))
    val parsed = LogFrame.stream(spark, dir.getAbsolutePath, mysqlOpts)
      .withColumn("ts", to_timestamp(concat(col("date"), lit(" ")),  "yyyy-MM-dd "))
    val counts = parsed.groupBy("action").agg(count("*").as("n"), max("pid").as("maxpid"))
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName("logstream_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.table("logstream_out").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq(("Query", 20L, 19)))
  }
}
