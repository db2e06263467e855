package graft

import org.apache.hadoop.fs.{BlockLocation, FileStatus, LocatedFileStatus, Path}
import org.apache.spark.sql.functions._

import graft.log.{LogChunk, LogInputPartition, LogOptions, LogScan}

/** Scan statistics + block locality (round-10 scale mechanics): without
  * `SupportsReportStatistics` a DSV2 relation defaults to an effectively
  * infinite size, so a small log lookup table could never be broadcast
  * into a join; and without `preferredLocations` an HDFS-class cluster
  * schedules log tasks with zero data locality.
  */
class LogStatsSpec extends SparkSpec {

  private val mysqlOpts = Map(
    "pattern" -> "(\\d{6})\\s(\\d{2}:\\d{2}:\\d{2})\\s+(\\d+)\\s(\\w+)\\s+(.+)",
    "fieldNames" -> "date, time, pid, action, query",
    "dataTypes" -> "DATE, TIME, INT, VARCHAR, VARCHAR",
    "dateFormat" -> "yyMMdd",
    "timeFormat" -> "HH:mm:ss")

  test("optimizer sees listed bytes, not the DSV2 infinite default") {
    val df = spark.read.format("log").options(mysqlOpts).load(fixture("mysql.log"))
    val fileLen = new java.io.File(new java.net.URI(fixture("mysql.log"))).length()
    val stats = df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats > 0 && stats <= fileLen * 2, s"stats=$stats fileLen=$fileLen")
  }

  test("projection prorates the size estimate") {
    val full = spark.read.format("log").options(mysqlOpts).load(fixture("mysql.log"))
    val fullSize = full.queryExecution.optimizedPlan.stats.sizeInBytes
    val pruned = full.select("action")
    val prunedSize = pruned.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(prunedSize < fullSize, s"pruned=$prunedSize full=$fullSize")
  }

  test("small log table broadcasts into a join (the point of the stats)") {
    val logDf = spark.read.format("log").options(mysqlOpts).load(fixture("mysql.log"))
    val fact = spark.range(0, 10000).select(col("id"), (col("id") % 30).as("pid"))
    val joined = fact.join(logDf.select(col("pid").cast("long").as("pid"), col("action")), "pid")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("filterSelectivity: shape priors multiply, floored at 0.05") {
    import org.apache.spark.sql.sources._
    assert(LogScan.filterSelectivity(Array.empty) == 1.0)
    assert(LogScan.filterSelectivity(Array(EqualTo("a", "x"))) == 0.2)
    assert(LogScan.filterSelectivity(Array(GreaterThan("a", 1))) == 0.5)
    assert(LogScan.filterSelectivity(
      Array(EqualTo("a", "x"), GreaterThan("b", 1))) == 0.2 * 0.5)
    // 4 equalities = 0.0016 raw -> floored: stacked filters can never
    // talk the optimizer into broadcasting a giant scan on faith
    assert(LogScan.filterSelectivity(
      Array(EqualTo("a", "x"), EqualTo("b", "y"), EqualTo("c", "z"),
        EqualTo("d", "w"))) == 0.05)
  }

  test("selective pushed filter flips a join side to broadcast") {
    val df = spark.read.format("log").options(mysqlOpts).load(fixture("mysql.log"))
    def logSide(d: org.apache.spark.sql.DataFrame) =
      d.select(col("pid").cast("long").as("pid"), col("action"))
    val fullSize =
      logSide(df).queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    val filtered = df.filter(col("action") === "Query")
    val filSize =
      logSide(filtered).queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    assert(filSize < fullSize, s"filtered=$filSize full=$fullSize")
    // threshold strictly between the two estimates: the filtered scan
    // qualifies for broadcast, the unfiltered one must not
    val threshold = (filSize + fullSize) / 2
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
    try {
      val fact = spark.range(0, 10000).select(col("id"), (col("id") % 30).as("pid"))
      def planOf(d: org.apache.spark.sql.DataFrame): String =
        fact.join(logSide(d), "pid").queryExecution.executedPlan.toString
      val unfPlan = planOf(df)
      val filPlan = planOf(filtered)
      assert(filPlan.contains("BroadcastHashJoin"), filPlan)
      assert(!unfPlan.contains("BroadcastHashJoin"), unfPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("codec-suffixed input scales by fileCompressionFactor") {
    val gzLen = new java.io.File(new java.net.URI(fixture("mysql.log.gz"))).length()
    def statsOf(): Long = spark.read.format("log").options(mysqlOpts)
      .load(fixture("mysql.log.gz"))
      .queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    val base = statsOf()
    val prev = spark.conf.get("spark.sql.sources.fileCompressionFactor")
    spark.conf.set("spark.sql.sources.fileCompressionFactor", "10.0")
    try {
      val scaled = statsOf()
      // expansion factor applies to the .gz bytes (>=9x leaves slack for
      // the ceil): without it a 10-20x-expanding gzip could be "broadcast
      // sized" on disk yet blow the broadcast memory budget in flight
      assert(scaled >= gzLen * 9 && scaled >= base * 9,
        s"scaled=$scaled base=$base gzLen=$gzLen")
    } finally spark.conf.set("spark.sql.sources.fileCompressionFactor", prev)
  }

  test("chunkHosts ranks overlapping block hosts by overlapped bytes") {
    val st = new FileStatus(300L, false, 1, 100L, 0L, new Path("file:/synthetic/a.log"))
    val blocks = Array(
      new BlockLocation(Array("h1:1", "h2:1"), Array("h1", "h2"), 0L, 100L),
      new BlockLocation(Array("h2:1", "h3:1"), Array("h2", "h3"), 100L, 100L),
      new BlockLocation(Array("h3:1", "h4:1"), Array("h3", "h4"), 200L, 100L))
    val lf = new LocatedFileStatus(st, blocks)
    // range [50, 250): h1 gets 50, h2 gets 150, h3 gets 150, h4 gets 50
    assert(LogScan.chunkHosts(lf, 50, 200) == Seq("h2", "h3", "h1"))
    // plain FileStatus: no locality claim
    assert(LogScan.chunkHosts(st, 0, 300).isEmpty)
  }

  test("partition locations aggregate chunk hosts weighted by bytes") {
    val p = LogInputPartition(Array(
      LogChunk("f1", 0, 100, 100, Seq("h1", "h2")),
      LogChunk("f2", 0, 900, 900, Seq("h2", "h3")),
      LogChunk("f3", 0, 500, 500, Seq("h3", "h4"))))
    // h2=1000, h3=1400, h1=100, h4=500 -> top3 by bytes
    assert(p.preferredLocations().toSeq == Seq("h3", "h2", "h4"))
  }

  test("local FS end-to-end: plain listing, NO fabricated localhost hosts") {
    // round-12: located listing is HDFS-only (listLocatedStatus measured
    // ~170x slower than listStatus off-HDFS — dev/SCALE_CURVE.md); on the
    // local filesystem chunks carry no hosts, which is the truth: a
    // "localhost" hint carries zero scheduling information
    val dir = java.nio.file.Files.createTempDirectory("graft_stats")
    java.nio.file.Files.write(dir.resolve("a.log"),
      "one line\nanother line\n".getBytes("UTF-8"))
    try {
      val opts = LogOptions.fromMap(Map.empty[String, String])
      val scan = new LogScan(opts.schema, opts, Seq(dir.toUri.toString))
      val parts = scan.planInputPartitions()
      assert(parts.nonEmpty)
      val hosts = parts.flatMap(_.asInstanceOf[LogInputPartition].chunks)
        .flatMap(_.hosts).distinct.toSeq
      assert(hosts.isEmpty, hosts)
      // and the rows still read fine without locality hints
      val spark2 = spark
      import spark2.implicits._
      val n = spark.read.format("log").load(dir.toUri.toString).count()
      assert(n == 2L)
    } finally {
      java.nio.file.Files.deleteIfExists(dir.resolve("a.log"))
      java.nio.file.Files.deleteIfExists(dir)
    }
  }
}
