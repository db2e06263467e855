package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.functions._

/** Encoding-robustness gate for the events loader: the driver has shipped
  * `events.parquet` with `ts` as int64 NANOSECONDS in one testdata
  * generation and as native timestamp[us] (TIMESTAMP_NTZ) in the next, and
  * the round-8 regression was the loader assuming one of them. This spec
  * writes the same three wall-clock instants in every encoding the column
  * has ever had — (a) int64 TIMESTAMP(NANOS), (b) timestamp[us] NTZ,
  * (c) timestamp[us] adjusted-to-UTC — and asserts `SparkEntry.events`
  * loads identical UTC wall-clock rows from each, so the next testdata
  * drift fails HERE instead of in the driver's correctness run.
  */
class EventsEncodingSpec extends SparkSpec {

  private val wallClocks =
    Seq("2024-03-01 00:00:00", "2024-03-01 11:30:15", "2024-07-31 23:59:59")

  private def micros(s: String): Long =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L

  /** Parquet-level writer: Spark cannot produce TIMESTAMP(NANOS) itself. */
  private def writeNanos(dir: java.io.File): Unit = {
    val schema = MessageTypeParser.parseMessageType(
      "message events { required int64 event_id; " +
        "required int64 ts (TIMESTAMP(NANOS,false)); }")
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(new Path(new java.io.File(dir, "events.parquet").getAbsolutePath))
      .withConf(conf)
      .withType(schema)
      .build()
    val gf = new SimpleGroupFactory(schema)
    try wallClocks.zipWithIndex.foreach { case (wc, i) =>
      writer.write(gf.newGroup()
        .append("event_id", i.toLong)
        .append("ts", micros(wc) * 1000L))
    } finally writer.close()
  }

  private def writeSpark(dir: java.io.File, ntz: Boolean): Unit = {
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      val cast = if (ntz) "timestamp_ntz" else "timestamp"
      val rows = wallClocks.zipWithIndex
        .map { case (wc, i) => s"($i, CAST('$wc' AS $cast))" }
        .mkString(", ")
      spark.sql(s"SELECT CAST(event_id AS BIGINT) AS event_id, ts " +
          s"FROM VALUES $rows AS t(event_id, ts)")
        .coalesce(1).write.mode("overwrite")
        .parquet(new java.io.File(dir, "events.parquet").getAbsolutePath)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
  }

  private def loadedWallClocks(dir: java.io.File): Seq[String] =
    SparkEntry.events(spark, dir.getAbsolutePath)
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("wc"))
      .orderBy("wc").collect().map(_.getString(0)).toSeq

  test("events() loads identical wall-clock rows from all three historical ts encodings") {
    val base = Files.createTempDirectory("graft_events_enc").toFile
    val nanosDir = new java.io.File(base, "nanos"); nanosDir.mkdirs()
    val ntzDir = new java.io.File(base, "ntz")
    val tzDir = new java.io.File(base, "tz")
    writeNanos(nanosDir)
    writeSpark(ntzDir, ntz = true)
    writeSpark(tzDir, ntz = false)
    assert(loadedWallClocks(nanosDir) === wallClocks)
    assert(loadedWallClocks(ntzDir) === wallClocks)
    assert(loadedWallClocks(tzDir) === wallClocks)
  }

  test("events() recovers the nanos encoding even when nanosAsLong starts false") {
    // the catch-and-retry path: a fresh session has the legacy flag off and
    // the parquet reader rejects TIMESTAMP(NANOS) at schema inference
    val base = Files.createTempDirectory("graft_events_enc2").toFile
    val nanosDir = new java.io.File(base, "nanos"); nanosDir.mkdirs()
    writeNanos(nanosDir)
    val prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try assert(loadedWallClocks(nanosDir) === wallClocks)
    finally spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
  }
}
