package graft

import java.io.File
import java.nio.file.attribute.FileTime
import java.nio.file.Files

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.log.{LogMicroBatchStream, LogOptions, LogStreamIndexOffset}

/** Streaming file retention (round-11): `maxFileAge` bounds the driver's
  * seen-files tracking across a rotating-directory tail, and
  * `cleanSource=delete|archive` retires processed files after their batch
  * commits — without either, a months-long tail grows driver state and
  * directory listings without bound.
  */
class LogRetentionSpec extends SparkSpec {

  private def writeLog(dir: File, name: String, lines: Seq[String], mtimeMs: Long): File = {
    val f = new File(dir, name)
    Files.writeString(f.toPath, lines.mkString("", "\n", "\n"))
    Files.setLastModifiedTime(f.toPath, FileTime.fromMillis(mtimeMs))
    f
  }

  private def mkStream(dir: File, extra: Map[String, String]): LogMicroBatchStream = {
    spark // force session init: the stream constructor uses SparkSession.active
    val opts = LogOptions.fromMap(Map(
      "pattern" -> "(\\d+) (\\w+)", "fieldNames" -> "id, level",
      "dataTypes" -> "INT, VARCHAR") ++ extra)
    new LogMicroBatchStream(opts, opts.schema, Seq(dir.getAbsolutePath),
      Files.createTempDirectory("graft_retention_ckpt").toString)
  }

  test("maxFileAge: old files expire from tracking, are not re-read, none missed") {
    val dir = Files.createTempDirectory("graft_retention").toFile
    val t0 = 1700000000000L // fixed epoch: mod-times drive the expiry clock
    writeLog(dir, "a.log", Seq("1 INFO"), t0)
    writeLog(dir, "b.log", Seq("2 INFO"), t0)
    val stream = mkStream(dir, Map("maxFileAge" -> "1h"))

    val off0 = stream.initialOffset()
    val off1 = stream.latestOffset(off0, ReadLimit.allAvailable())
    assert(stream.trackedFiles.size == 2)

    // 10h later a new file arrives: cutoff advances to t0+9h, a/b expire
    writeLog(dir, "c.log", Seq("3 INFO"), t0 + 10L * 3600 * 1000)
    val off2 = stream.latestOffset(off1, ReadLimit.allAvailable())
    assert(stream.trackedFiles.keySet.map(new File(_).getName) == Set("c.log"),
      stream.trackedFiles)

    // a.log is no longer tracked but must NOT be re-admitted (too old);
    // a late-arriving old file (e.g. moved in by an archiver) is ignored;
    // a fresh file is admitted
    writeLog(dir, "late_old.log", Seq("9 WARN"), t0)
    writeLog(dir, "d.log", Seq("4 INFO"), t0 + 10L * 3600 * 1000 + 1)
    val off3 = stream.latestOffset(off2, ReadLimit.allAvailable())
    val batch3 = stream.planInputPartitions(off2, off3)
    val names3 = batch3.flatMap(_.asInstanceOf[graft.log.LogInputPartition].chunks)
      .map(c => new File(c.path).getName).toSet
    assert(names3 == Set("d.log"), names3)

    // no new files: offset stable, nothing re-admitted
    val off4 = stream.latestOffset(off3, ReadLimit.allAvailable())
    assert(off4.asInstanceOf[LogStreamIndexOffset].index ==
      off3.asInstanceOf[LogStreamIndexOffset].index)
  }

  test("maxFileAge: expiry clock survives a restart (mod-times persist in the log)") {
    val dir = Files.createTempDirectory("graft_retention_rs").toFile
    val ckpt = Files.createTempDirectory("graft_retention_rs_ckpt").toString
    val t0 = 1700000000000L
    val opts = LogOptions.fromMap(Map(
      "pattern" -> "(\\d+) (\\w+)", "fieldNames" -> "id, level",
      "dataTypes" -> "INT, VARCHAR", "maxFileAge" -> "1h"))
    writeLog(dir, "a.log", Seq("1 INFO"), t0)
    writeLog(dir, "b.log", Seq("2 INFO"), t0 + 10L * 3600 * 1000)
    val s1 = new LogMicroBatchStream(opts, opts.schema, Seq(dir.getAbsolutePath), ckpt)
    val off1 = s1.latestOffset(s1.initialOffset(), ReadLimit.allAvailable())

    // fresh instance over the same checkpoint: restore must rebuild the
    // newest-mod-time clock, so the old a.log still can't be re-admitted
    // even though its tracking entry was purged
    val s2 = new LogMicroBatchStream(opts, opts.schema, Seq(dir.getAbsolutePath), ckpt)
    assert(s2.trackedFiles.values.max == t0 + 10L * 3600 * 1000)
    val off2 = s2.latestOffset(off1, ReadLimit.allAvailable())
    assert(off2.asInstanceOf[LogStreamIndexOffset].index ==
      off1.asInstanceOf[LogStreamIndexOffset].index)
  }

  test("soak: rotating tail keeps tracking and compact log bounded, every line once") {
    val dir = Files.createTempDirectory("graft_retention_soak").toFile
    val ckptDir = Files.createTempDirectory("graft_retention_soak_ckpt")
    val t0 = 1700000000000L
    val hour = 3600 * 1000L
    // cycle 0 exists before start so the source has data at first trigger
    writeLog(dir, "f000.log", Seq("0 INFO"), t0)
    val stream = spark.readStream.format("log")
      .option("pattern", "(\\d+) (\\w+)")
      .option("schema", "id INT, level VARCHAR")
      .option("maxFileAge", "3h")
      .option("maxFilesPerTrigger", "2")
      .load(dir.getAbsolutePath)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("retention_soak")
      .option("checkpointLocation", ckptDir.toString)
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      val cycles = 30
      for (i <- 1 to cycles) {
        // one new file per "hour"; rotation deletes files older than 5h
        // (only ones already outside the 3h tracking window)
        writeLog(dir, f"f$i%03d.log", Seq(s"$i INFO"), t0 + i * hour)
        dir.listFiles().filter { f =>
          Files.getLastModifiedTime(f.toPath).toMillis < t0 + (i - 5) * hour
        }.foreach(_.delete())
        q.processAllAvailable()
      }
      val got = spark.table("retention_soak").select("id").collect().map(_.getInt(0)).sorted
      assert(got.toSeq == (0 to cycles), // every line exactly once
        s"got ${got.length} rows: ${got.take(50).mkString(",")}")
      // bounded state: the newest compact entry tracks the rotation
      // window (~4 files at 3h age + 1h cadence), not all 31 files
      def findCompacts(f: File): Seq[File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(findCompacts)
        else if (f.getName.endsWith(LogMicroBatchStream.CompactSuffix)) Seq(f) else Nil
      val compacts = findCompacts(ckptDir.toFile).sortBy(_.getName)
      assert(compacts.nonEmpty, "no .compact entry written")
      val last = Files.readString(compacts.last.toPath)
      val n = LogMicroBatchStream.entriesFromJson(last).size
      assert(n <= 6, s"compact entry tracks $n files — retention not bounding state: $last")
    } finally q.stop()
  }

  test("cleanSource=delete removes source files after their batch commits") {
    val dir = Files.createTempDirectory("graft_clean_del").toFile
    writeLog(dir, "a.log", Seq("1 INFO", "2 WARN"), System.currentTimeMillis())
    val stream = spark.readStream.format("log")
      .option("pattern", "(\\d+) (\\w+)")
      .option("schema", "id INT, level VARCHAR")
      .option("cleanSource", "delete")
      .load(dir.getAbsolutePath)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("clean_delete")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      assert(spark.table("clean_delete").count() == 2)
      // commit(N) fires when batch N+1 constructs (Spark's own file-source
      // cleaning cadence) — drive one more batch, then a.log must be gone
      writeLog(dir, "b.log", Seq("3 INFO"), System.currentTimeMillis())
      q.processAllAvailable()
      assert(spark.table("clean_delete").count() == 3)
      assert(!new File(dir, "a.log").exists(), dir.listFiles().map(_.getName).toSeq)
    } finally q.stop()
  }

  test("cleanSource after restart: bounded scan still cleans everything recent") {
    // the first commit after a restart scans only one GC horizon of
    // entries (cleanedThrough is in-memory) — this pins that the bound
    // never OVER-skips: a freshly-committed batch's files are still
    // cleaned even when endIdx is far past the horizon
    val dir = Files.createTempDirectory("graft_clean_restart").toFile
    val ckpt = Files.createTempDirectory("graft_clean_restart_ckpt").toString
    val prev = spark.conf.getOption("spark.sql.streaming.minBatchesToRetain")
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "2") // horizon = 10+10 = 20
    try {
      def mk() = {
        val opts = LogOptions.fromMap(Map(
          "pattern" -> "(\\d+) (\\w+)", "fieldNames" -> "id, level",
          "dataTypes" -> "INT, VARCHAR", "cleansource" -> "delete"))
        new LogMicroBatchStream(opts, opts.schema, Seq(dir.getAbsolutePath), ckpt)
      }
      val s1 = mk()
      var off: org.apache.spark.sql.connector.read.streaming.Offset = s1.initialOffset()
      for (i <- 1 to 25) { // 25 committed batches: endIdx outlives the horizon
        writeLog(dir, f"f$i%03d.log", Seq(s"$i INFO"), System.currentTimeMillis())
        off = s1.latestOffset(off, ReadLimit.allAvailable())
        s1.commit(off)
      }
      assert(dir.listFiles().count(_.getName.endsWith(".log")) == 0,
        dir.listFiles().map(_.getName).toSeq)
      // restart: fresh instance, cleanedThrough back to -1
      val s2 = mk()
      writeLog(dir, "f026.log", Seq("26 INFO"), System.currentTimeMillis())
      val off26 = s2.latestOffset(off, ReadLimit.allAvailable())
      s2.commit(off26) // from = endIdx - 20, must still cover batch 26
      assert(!new File(dir, "f026.log").exists(),
        dir.listFiles().map(_.getName).toSeq)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.minBatchesToRetain", v)
      case None    => spark.conf.unset("spark.sql.streaming.minBatchesToRetain")
    }
  }

  test("first commit after restart sweeps ALL surviving entries (failed-delete recovery)") {
    // A delete that failed (warn) or a commit that never ran in a crashed
    // process leaves a file behind whose entry can sit OUTSIDE the
    // horizon-bounded restart scan (e.g. when minBatchesToRetain shrank
    // across the restart). The first commit after restart must sweep the
    // full surviving plain-entry range once — bounded by GC, idempotent.
    val dir = Files.createTempDirectory("graft_clean_sweep").toFile
    val ckpt = Files.createTempDirectory("graft_clean_sweep_ckpt").toString
    val prev = spark.conf.getOption("spark.sql.streaming.minBatchesToRetain")
    try {
      def mk() = {
        val opts = LogOptions.fromMap(Map(
          "pattern" -> "(\\d+) (\\w+)", "fieldNames" -> "id, level",
          "dataTypes" -> "INT, VARCHAR", "cleansource" -> "delete"))
        new LogMicroBatchStream(opts, opts.schema, Seq(dir.getAbsolutePath), ckpt)
      }
      // phase 1: generous retention — every entry 1..25 survives GC
      spark.conf.set("spark.sql.streaming.minBatchesToRetain", "50")
      val s1 = mk()
      var off: org.apache.spark.sql.connector.read.streaming.Offset = s1.initialOffset()
      for (i <- 1 to 25) {
        writeLog(dir, f"f$i%03d.log", Seq(s"$i INFO"), System.currentTimeMillis())
        off = s1.latestOffset(off, ReadLimit.allAvailable())
        s1.commit(off)
      }
      // simulate two failed deletes: their files reappear, entries 2 and 3
      // are now pre-horizon under the restart's SMALLER retention conf
      writeLog(dir, "f002.log", Seq("2 INFO"), System.currentTimeMillis())
      writeLog(dir, "f003.log", Seq("3 INFO"), System.currentTimeMillis())
      spark.conf.set("spark.sql.streaming.minBatchesToRetain", "2") // horizon = 20
      val s2 = mk()
      writeLog(dir, "f026.log", Seq("26 INFO"), System.currentTimeMillis())
      val off26 = s2.latestOffset(off, ReadLimit.allAvailable())
      s2.commit(off26)
      val left = dir.listFiles().map(_.getName).filter(_.endsWith(".log")).toSeq
      assert(left.isEmpty, s"stale files not swept on restart: $left")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.minBatchesToRetain", v)
      case None    => spark.conf.unset("spark.sql.streaming.minBatchesToRetain")
    }
  }

  test("stray foreign files in the entry-log dir are skipped, not fatal") {
    // an editor backup / tool metadata file must not crash restore, GC, or
    // the first-commit sweep with a NumberFormatException (review finding)
    val dir = Files.createTempDirectory("graft_clean_stray").toFile
    val ckpt = Files.createTempDirectory("graft_clean_stray_ckpt").toString
    def mk() = {
      val opts = LogOptions.fromMap(Map(
        "pattern" -> "(\\d+) (\\w+)", "fieldNames" -> "id, level",
        "dataTypes" -> "INT, VARCHAR", "cleansource" -> "delete"))
      new LogMicroBatchStream(opts, opts.schema, Seq(dir.getAbsolutePath), ckpt)
    }
    val s1 = mk()
    var off: org.apache.spark.sql.connector.read.streaming.Offset = s1.initialOffset()
    for (i <- 1 to 12) { // crosses a compact boundary (GC runs too)
      writeLog(dir, f"f$i%03d.log", Seq(s"$i INFO"), System.currentTimeMillis())
      off = s1.latestOffset(off, ReadLimit.allAvailable())
      s1.commit(off)
    }
    // drop foreign files into the log dir, then restart + commit + trigger
    val logDir = new File(ckpt, "graft-file-log")
    Files.writeString(new File(logDir, "00000000000000000005~").toPath, "backup")
    Files.writeString(new File(logDir, "NOTES.txt").toPath, "hands off")
    val s2 = mk()
    writeLog(dir, "f013.log", Seq("13 INFO"), System.currentTimeMillis())
    val off13 = s2.latestOffset(off, ReadLimit.allAvailable())
    s2.commit(off13) // restore, sweep and GC all see the stray names
    assert(!new File(dir, "f013.log").exists(), dir.listFiles().map(_.getName).toSeq)
    assert(new File(logDir, "NOTES.txt").exists()) // never deleted by GC either
  }

  test("cleanSource=archive moves processed files; archive is not re-ingested") {
    val dir = Files.createTempDirectory("graft_clean_arc").toFile
    val archive = Files.createTempDirectory("graft_clean_arc_dst").toFile
    writeLog(dir, "a.log", Seq("1 INFO"), System.currentTimeMillis())
    val stream = spark.readStream.format("log")
      .option("pattern", "(\\d+) (\\w+)")
      .option("schema", "id INT, level VARCHAR")
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", archive.getAbsolutePath)
      .load(dir.getAbsolutePath)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("clean_archive")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      writeLog(dir, "b.log", Seq("2 INFO"), System.currentTimeMillis())
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = spark.table("clean_archive")
      assert(rows.count() == 2)
      assert(rows.agg(sum("id")).collect().head.getLong(0) == 3L) // 1+2, no dupes
      assert(!new File(dir, "a.log").exists())
      // archived under the original absolute path
      val archived = Files.walk(archive.toPath).filter(Files.isRegularFile(_))
        .map[String](_.getFileName.toString).toArray
      assert(archived.contains("a.log"), archived.mkString(","))
    } finally q.stop()
  }

  test("cleanSource=archive into a watched path is rejected") {
    val dir = Files.createTempDirectory("graft_clean_bad").toFile
    writeLog(dir, "a.log", Seq("1 INFO"), System.currentTimeMillis())
    val stream = spark.readStream.format("log")
      .option("pattern", "(\\d+) (\\w+)")
      .option("schema", "id INT, level VARCHAR")
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", new File(dir, "archived").getAbsolutePath)
      .load(dir.getAbsolutePath)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("clean_bad")
      .trigger(Trigger.ProcessingTime(0)).start()
    val e = intercept[Exception] { q.processAllAvailable(); q.awaitTermination(10000) }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t => Option(t.getMessage).exists(_.contains("sourceArchiveDir"))),
      chain(e).map(_.getMessage).mkString(" | "))
    q.stop()
  }

  test("latestFirst: backlog drains newest-first under a cap, exactly once") {
    val dir = Files.createTempDirectory("graft_latest_first").toFile
    val t0 = 1700000000000L
    for (i <- 0 until 5)
      writeLog(dir, s"f$i.log", Seq(s"$i INFO"), t0 + i * 1000)
    val stream = mkStream(dir, Map(
      "latestFirst" -> "true", "maxFilesPerTrigger" -> "2",
      // age that would drop the backlog tail if the filter stayed active;
      // latestFirst+cap must disable it (Spark's file-source rule)
      "maxFileAge" -> "1s"))
    def batchNames(s: LogMicroBatchStream, a: org.apache.spark.sql.connector.read.streaming.Offset,
        b: org.apache.spark.sql.connector.read.streaming.Offset): Seq[String] =
      s.planInputPartitions(a, b).flatMap(_.asInstanceOf[graft.log.LogInputPartition].chunks)
        .map(c => new File(c.path).getName).toSeq.sorted
    val o0 = stream.initialOffset()
    val o1 = stream.latestOffset(o0, ReadLimit.maxFiles(2))
    assert(batchNames(stream, o0, o1) == Seq("f3.log", "f4.log")) // newest two
    val o2 = stream.latestOffset(o1, ReadLimit.maxFiles(2))
    assert(batchNames(stream, o1, o2) == Seq("f1.log", "f2.log"))
    val o3 = stream.latestOffset(o2, ReadLimit.maxFiles(2))
    assert(batchNames(stream, o2, o3) == Seq("f0.log")) // backlog tail NOT lost
    val o4 = stream.latestOffset(o3, ReadLimit.maxFiles(2))
    assert(o4.asInstanceOf[LogStreamIndexOffset].index ==
      o3.asInstanceOf[LogStreamIndexOffset].index) // nothing re-admitted
  }

  test("entry-log GC: a long tail keeps a bounded number of checkpoint files") {
    val dir = Files.createTempDirectory("graft_gc").toFile
    val ckpt = Files.createTempDirectory("graft_gc_ckpt").toString
    val t0 = 1700000000000L
    val prev = spark.conf.getOption("spark.sql.streaming.minBatchesToRetain")
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "5")
    try {
      val opts = LogOptions.fromMap(Map(
        "pattern" -> "(\\d+) (\\w+)", "fieldNames" -> "id, level",
        "dataTypes" -> "INT, VARCHAR"))
      val s = new LogMicroBatchStream(opts, opts.schema, Seq(dir.getAbsolutePath), ckpt)
      var off: org.apache.spark.sql.connector.read.streaming.Offset = s.initialOffset()
      for (i <- 0 to 40) { // one entry per batch -> indices 0..40
        writeLog(dir, f"f$i%03d.log", Seq(s"$i INFO"), t0 + i * 1000)
        off = s.latestOffset(off, ReadLimit.allAvailable())
      }
      // compacts at 10/20/30/40; retain = max(5, CompactInterval)=10, so
      // after the compact at 40 everything below index 30 is GC'd
      val logDir = new File(ckpt, "graft-file-log")
      val names = logDir.listFiles().map(_.getName).filterNot(_.startsWith(".")).sorted
      val idxs = names.map(_.stripSuffix(LogMicroBatchStream.CompactSuffix).toLong)
      assert(idxs.min >= 30, names.mkString(","))
      assert(names.count(_.endsWith(LogMicroBatchStream.CompactSuffix)) == 2,
        names.mkString(",")) // compacts 30 and 40 survive
      // restore from the GC'd log: seen-set intact, nothing re-admitted,
      // recent ranges still replay exactly
      val s2 = new LogMicroBatchStream(opts, opts.schema, Seq(dir.getAbsolutePath), ckpt)
      val off2 = s2.latestOffset(off, ReadLimit.allAvailable())
      assert(off2.asInstanceOf[LogStreamIndexOffset].index ==
        off.asInstanceOf[LogStreamIndexOffset].index)
      val last = s2.planInputPartitions(
        graft.log.LogStreamIndexOffset(39), graft.log.LogStreamIndexOffset(40))
        .flatMap(_.asInstanceOf[graft.log.LogInputPartition].chunks)
        .map(c => new File(c.path).getName).toSeq
      assert(last == Seq("f040.log"), last)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.minBatchesToRetain", v)
      case None => spark.conf.unset("spark.sql.streaming.minBatchesToRetain")
    }
  }

  test("option validation: bad maxFileAge / cleanSource values fail at load") {
    def base = Map("pattern" -> "(\\d+)", "fieldNames" -> "id")
    val e1 = intercept[IllegalArgumentException](
      LogOptions.fromMap(base + ("maxFileAge" -> "soon")))
    assert(e1.getMessage.contains("maxFileAge"))
    val e2 = intercept[IllegalArgumentException](
      LogOptions.fromMap(base + ("cleanSource" -> "shred")))
    assert(e2.getMessage.contains("cleanSource"))
    val e3 = intercept[IllegalArgumentException](
      LogOptions.fromMap(base + ("cleanSource" -> "archive")))
    assert(e3.getMessage.contains("sourceArchiveDir"))
    // duration forms all parse
    assert(LogOptions.fromMap(base + ("maxFileAge" -> "7d")).maxFileAgeMs
      .contains(7L * 24 * 3600 * 1000))
    assert(LogOptions.fromMap(base + ("maxFileAge" -> "30m")).maxFileAgeMs
      .contains(30L * 60 * 1000))
    val e4 = intercept[IllegalArgumentException](
      LogOptions.fromMap(base + ("latestFirst" -> "yes")))
    assert(e4.getMessage.contains("latestFirst"))
    assert(LogOptions.fromMap(base + ("latestFirst" -> "true")).latestFirst)
  }
}
