package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Native micro-batch streaming through the DSV2 source:
  * `spark.readStream.format("log")` tails a directory, new files become new
  * batches, already-seen files are not re-read.
  */
class LogStreamSpec extends SparkSpec {

  test("readStream.format(log): new files arrive as new batches, no re-reads") {
    val dir = Files.createTempDirectory("logstream_native").toFile
    def writeLog(name: String, lines: Seq[String]): Unit =
      Files.writeString(new File(dir, name).toPath, lines.mkString("\n"))

    writeLog("a.log", Seq("1 INFO boot", "2 WARN hot"))
    val stream = spark.readStream.format("log")
      .option("pattern", "(\\d+) (\\w+) (.+)")
      .option("schema", "id INT, level VARCHAR, msg VARCHAR")
      .load(dir.getAbsolutePath)
    assert(stream.isStreaming)

    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("native_log_stream")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      assert(spark.table("native_log_stream").count() == 2)

      writeLog("b.log", Seq("3 ERROR crash", "4 INFO recover", "not matching"))
      q.processAllAvailable()
      val rows = spark.table("native_log_stream")
      assert(rows.count() == 5)
      assert(rows.filter(col("unmatched_lines").isNotNull).count() == 1)
      assert(rows.agg(sum("id")).collect().head.getLong(0) == 10L) // 1+2+3+4, no dupes

      // nothing new: no extra rows
      q.processAllAvailable()
      assert(spark.table("native_log_stream").count() == 5)
    } finally q.stop()
  }

  test("multi-line records stream: recordStartPattern frames blocks per micro-batch") {
    val dir = Files.createTempDirectory("logstream_ml").toFile
    def writeLog(name: String, content: String): Unit =
      Files.writeString(new File(dir, name).toPath, content)

    writeLog("a.log", "1 ERROR boom\n  at f.m(F.java:1)\n2 INFO ok\n")
    val stream = spark.readStream.format("log")
      .option("pattern", "(?s)(\\d+) (\\w+) (.+)")
      .option("recordStartPattern", "^\\d+ ")
      .option("schema", "id INT, level VARCHAR, body VARCHAR")
      .load(dir.getAbsolutePath)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("ml_log_stream")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      val first = spark.table("ml_log_stream").collect()
      assert(first.length == 2)
      assert(first.find(_.getInt(0) == 1).get.getString(2) == "boom\n  at f.m(F.java:1)")
      // a later file is its own batch; its records frame independently
      writeLog("b.log", "3 WARN tail\n  ctx line\n")
      q.processAllAvailable()
      val rows = spark.table("ml_log_stream").collect()
      assert(rows.length == 3)
      assert(rows.find(_.getInt(0) == 3).get.getString(2) == "tail\n  ctx line")
    } finally q.stop()
  }

  test("glob source with no matches yet: empty batches until a file arrives") {
    // dir/*.log before any matching file exists is a NORMAL streaming
    // startup state (Spark's FileStreamSource tolerates it) — the stream
    // must poll, not hard-fail on the first trigger
    val dir = Files.createTempDirectory("logstream_glob").toFile
    val stream = spark.readStream.format("log")
      .option("pattern", "(\\d+) (\\w+) (.+)")
      .option("schema", "id INT, level VARCHAR, msg VARCHAR")
      .load(new File(dir, "*.log").getAbsolutePath)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("glob_log_stream")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable() // no matches: must not throw
      assert(spark.table("glob_log_stream").count() == 0)
      Files.writeString(new File(dir, "a.log").toPath, "1 INFO boot\n2 WARN hot")
      q.processAllAvailable()
      assert(spark.table("glob_log_stream").count() == 2)
      // non-matching extension stays invisible to the glob
      Files.writeString(new File(dir, "b.txt").toPath, "9 INFO other")
      q.processAllAvailable()
      assert(spark.table("glob_log_stream").count() == 2)
    } finally q.stop()
  }

  test("missing concrete path and glob with missing parent still hard-fail") {
    def startOn(path: String) = spark.readStream.format("log")
      .option("pattern", "(\\d+) (.+)")
      .option("schema", "id INT, msg VARCHAR")
      .load(path)
      .writeStream.outputMode("append")
      .format("memory").queryName("missing_log_stream")
      .trigger(Trigger.ProcessingTime(0)).start()
    val base = Files.createTempDirectory("logstream_missing").toFile
    for (p <- Seq(s"$base/no_such_dir", s"$base/no_such_dir/*.log")) {
      val q = startOn(p)
      try {
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        def msgs(t: Throwable): Seq[String] =
          Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
        assert(msgs(e).exists(_.contains("path not found")), s"for $p got: $e")
      } finally q.stop()
    }
  }

  test("restart after many files: O(1) index offsets, compacted log, no re-reads") {
    val dir = Files.createTempDirectory("logstream_restart").toFile
    val ckpt = Files.createTempDirectory("logstream_ckpt").toFile.getAbsolutePath
    def writeLog(i: Int): Unit =
      Files.writeString(new File(dir, f"f$i%03d.log").toPath, s"$i INFO payload")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    def start() = spark.readStream.format("log")
      .option("pattern", "(\\d+) (\\w+) (.+)")
      .option("schema", "id INT, level VARCHAR, msg VARCHAR")
      .load(dir.getAbsolutePath)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.select("id").collect().foreach(r => got.add(r.getInt(0)))
      }
      .trigger(Trigger.ProcessingTime(0)).start()

    // phase 1: 12 ticks -> 12 log entries, crossing the compact interval
    val q1 = start()
    try {
      (1 to 12).foreach { i => writeLog(i); q1.processAllAvailable() }
    } finally q1.stop()
    assert(got.size == 12)
    import scala.jdk.CollectionConverters._
    assert(got.asScala.map(_.toInt).sum == (1 to 12).sum)

    // phase 2: restart from the checkpoint; only NEW files may arrive
    got.clear()
    (13 to 15).foreach(writeLog)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(got.asScala.map(_.toInt).toSet == (13 to 15).toSet,
      s"restart must read exactly the new files, got ${got.asScala}")

    // offsets in the checkpoint are O(1) indexes, not path lists
    val offsetDir = new File(ckpt, "offsets")
    val latest = offsetDir.listFiles().filter(f => f.getName.forall(_.isDigit))
      .maxBy(_.getName.toInt)
    val txt = Files.readString(latest.toPath)
    assert(txt.contains("\"index\""), txt)
    assert(!txt.contains(".log"), s"offset still carries file paths: $txt")

    // the persistent file log compacted at the interval boundary
    def findCompacts(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(findCompacts)
      else if (f.getName.endsWith(".compact")) Seq(f) else Nil
    assert(findCompacts(new File(ckpt)).nonEmpty, "no .compact entry written")
  }

  test("admission control: maxFilesPerTrigger splits a backlog into bounded batches") {
    val dir = Files.createTempDirectory("logstream_admission").toFile
    (1 to 6).foreach { i =>
      Files.writeString(new File(dir, f"f$i%02d.log").toPath, s"$i INFO payload")
    }
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Int])]()
    val q = spark.readStream.format("log")
      .option("pattern", "(\\d+) (\\w+) (.+)")
      .option("schema", "id INT, level VARCHAR, msg VARCHAR")
      .option("maxFilesPerTrigger", "2")
      .load(dir.getAbsolutePath)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val ids = b.select("id").collect().map(_.getInt(0)).toSeq
        if (ids.nonEmpty) batches.add((id, ids)): Unit
      }
      .trigger(Trigger.AvailableNow()).start()
    try assert(q.awaitTermination(120000)) finally q.stop()
    import scala.jdk.CollectionConverters._
    val bs = batches.asScala.toSeq.sortBy(_._1)
    assert(bs.size == 3, s"6 files at maxFilesPerTrigger=2 must drain in 3 batches, got $bs")
    assert(bs.forall(_._2.size == 2), s"each batch must carry exactly 2 files' rows: $bs")
    assert(bs.flatMap(_._2).sorted == (1 to 6), s"no loss, no dupes: $bs")
  }

  test("admission control: maxBytesPerTrigger bounds batches; restart stays replay-safe") {
    val dir = Files.createTempDirectory("logstream_bytes").toFile
    val ckpt = Files.createTempDirectory("logstream_bytes_ckpt").toFile.getAbsolutePath
    (1 to 4).foreach { i =>
      Files.writeString(new File(dir, f"g$i%02d.log").toPath, s"$i INFO payload")
    }
    val fileLen = new File(dir, "g01.log").length()
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    var nBatches = 0
    def start() = spark.readStream.format("log")
      .option("pattern", "(\\d+) (\\w+) (.+)")
      .option("schema", "id INT, level VARCHAR, msg VARCHAR")
      .option("maxBytesPerTrigger", fileLen.toString) // one file per batch
      .load(dir.getAbsolutePath)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ids = b.select("id").collect().map(_.getInt(0))
        if (ids.nonEmpty) { nBatches += 1; ids.foreach(got.add(_)) }
      }
      .trigger(Trigger.AvailableNow()).start()
    val q1 = start()
    try assert(q1.awaitTermination(120000)) finally q1.stop()
    import scala.jdk.CollectionConverters._
    assert(nBatches == 4, s"4 one-file batches expected, got $nBatches")
    assert(got.asScala.map(_.toInt).toSeq.sorted == (1 to 4))
    // restart from checkpoint with a new backlog: limits still apply, no
    // re-reads of already-committed files
    got.clear(); nBatches = 0
    (5 to 6).foreach { i =>
      Files.writeString(new File(dir, f"g$i%02d.log").toPath, s"$i INFO payload")
    }
    val q2 = start()
    try assert(q2.awaitTermination(120000)) finally q2.stop()
    assert(nBatches == 2 && got.asScala.map(_.toInt).toSeq.sorted == (5 to 6),
      s"restart must admit only the new files one per batch, got $nBatches $got")
  }

  test("streaming aggregation over the native log stream") {
    val dir = Files.createTempDirectory("logstream_agg").toFile
    Files.writeString(new File(dir, "x.log").toPath,
      (1 to 100).map(i => s"$i ${if (i % 2 == 0) "EVEN" else "ODD"} payload").mkString("\n"))
    val counts = spark.readStream.format("log")
      .option("pattern", "(\\d+) (\\w+) (.+)")
      .option("schema", "id INT, parity VARCHAR, msg VARCHAR")
      .load(dir.getAbsolutePath)
      .groupBy("parity").agg(count(lit(1)).as("n"), sum("id").as("s"))
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName("native_log_agg")
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      val out = spark.table("native_log_agg").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(out == Map("EVEN" -> ((50L, 2550L)), "ODD" -> ((50L, 2500L))))
    } finally q.stop()
  }
}
