package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DSV2 custom metrics (round-11 observability): the scan reports
  * matched / unmatched / dropped line counts through Spark's metrics
  * system, so "is my pattern actually matching" is answered from the UI
  * or metrics API instead of a second count(unmatched_lines) pass.
  */
class LogMetricsSpec extends SparkSpec {

  private def metricsOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
    df.collect()
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))
    scan.metrics.map { case (k, m) => k -> m.value }.toMap
  }

  test("matched/unmatched counts surface through the scan's SQL metrics") {
    val m = metricsOf(spark.read.format("log")
      .option("pattern", "(\\d+) (INFO|WARN|ERROR)\\s*(\\w+)?(?:\\s+(.*))?")
      .option("fieldNames", "ts_ms, level, component, msg")
      .load(fixture("mixed.log")))
    // mixed.log: matched + unmatched lines both present
    assert(m.getOrElse("matchedLines", -1L) > 0, m)
    assert(m.getOrElse("unmatchedLines", -1L) > 0, m)
    assert(m.getOrElse("droppedLines", -1L) == 0, m)
    val rows = spark.read.format("log")
      .option("pattern", "(\\d+) (INFO|WARN|ERROR)\\s*(\\w+)?(?:\\s+(.*))?")
      .option("fieldNames", "ts_ms, level, component, msg")
      .load(fixture("mixed.log"))
    val matched = rows.filter(col("unmatched_lines").isNull).count()
    val unmatched = rows.filter(col("unmatched_lines").isNotNull).count()
    assert(m("matchedLines") == matched, m)
    assert(m("unmatchedLines") == unmatched, m)
  }

  test("filesPruned/bytesPruned driver metrics report partition pruning at run time") {
    val root = java.nio.file.Files.createTempDirectory("logmetrics_part").toFile
    for (i <- 0 until 30) {
      val d = new java.io.File(root, s"shard=$i")
      d.mkdirs()
      java.nio.file.Files.writeString(new java.io.File(d, "a.log").toPath,
        s"$i INFO\n")
    }
    val m = metricsOf(spark.read.format("log")
      .option("pattern", "(\\d+) (\\w+)")
      .option("schema", "id INT, level VARCHAR")
      .option("partitionSchema", "shard INT")
      .option("extensions", "log")
      .load(root.getAbsolutePath)
      .filter(col("shard") < 7))
    assert(m.getOrElse("filesRead", -1L) == 7, m)
    assert(m.getOrElse("filesPruned", -1L) == 23, m)
    assert(m.getOrElse("bytesRead", -1L) > 0, m)
    assert(m.getOrElse("bytesPruned", -1L) > m("bytesRead"), m)
    // unpruned scan: everything read, nothing pruned
    val all = metricsOf(spark.read.format("log")
      .option("pattern", "(\\d+) (\\w+)")
      .option("schema", "id INT, level VARCHAR")
      .option("partitionSchema", "shard INT")
      .option("extensions", "log")
      .load(root.getAbsolutePath))
    assert(all.getOrElse("filesRead", -1L) == 30, all)
    assert(all.getOrElse("filesPruned", -1L) == 0, all)
  }

  test("droppedLines counts pushed-filter and DROPMALFORMED drops") {
    val filtered = metricsOf(spark.read.format("log")
      .option("pattern", "(\\d{6})\\s(\\d{2}:\\d{2}:\\d{2})\\s+(\\d+)\\s(\\w+)\\s+(.+)")
      .option("fieldNames", "date, time, pid, action, query")
      .option("dataTypes", "VARCHAR, VARCHAR, INT, VARCHAR, VARCHAR")
      .load(fixture("mysql.log"))
      .filter(col("action") === "Query")) // pushed into the reader
    assert(filtered.getOrElse("droppedLines", -1L) > 0, filtered)

    val dropped = metricsOf(spark.read.format("log")
      .option("pattern", "(\\d+) (INFO|WARN|ERROR)\\s*(\\w+)?(?:\\s+(.*))?")
      .option("fieldNames", "ts_ms, level, component, msg")
      .option("mode", "DROPMALFORMED")
      .load(fixture("mixed.log")))
    assert(dropped.getOrElse("droppedLines", -1L) > 0, dropped)
  }
}
