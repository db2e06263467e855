package graft.dev

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

import graft.log.{LineParser, LogOptions}

/** Micro-profile of the log scan's per-line cost (VERDICT r9 item 3):
  * where does a `q_log_timestamp`-class scan spend its time — regex
  * matching, type coercion, or InternalRow materialization? The answer
  * decides whether a columnar `PartitionReader[ColumnarBatch]` is worth
  * building (it only pays if row materialization dominates).
  *
  * Stages measured over the SAME synthetic line corpus:
  *   - `regex_only`: Matcher.find + group(i) for every capture group —
  *     the irreducible pattern-match cost.
  *   - `parse_full`: [[LineParser.parse]] — regex + TIMESTAMP/VARCHAR/INT
  *     coercion + GenericInternalRow (what the reader runs per line).
  *   - end-to-end: `spark.read.format("log").count()` vs
  *     `spark.read.text.count()` on the same file — source overhead vs
  *     the Hadoop line-framing floor.
  *
  * Results + the go/no-go decision are recorded in dev/SCAN_PROFILE.md.
  */
object ScanProfile {
  private val Pattern = "(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}) (\\w+) evt=(\\d+)"

  def main(args: Array[String]): Unit = {
    val nLines = if (args.nonEmpty) args(0).toInt else 2000000
    val lines = new Array[String](nLines)
    var i = 0
    while (i < nLines) {
      val mm = 1 + i % 12
      val type_ = if (i % 3 == 0) "click" else if (i % 3 == 1) "view" else "purchase"
      lines(i) = f"2024-$mm%02d-${1 + i % 28}%02d ${i % 24}%02d:${i % 60}%02d:${(i * 7) % 60}%02d $type_ evt=$i"
      i += 1
    }

    val opts = LogOptions.fromMap(Map(
      "pattern" -> Pattern,
      "fieldNames" -> "ts, event_type, event_id",
      "dataTypes" -> "TIMESTAMP, VARCHAR, INT",
      "dateFormat" -> "yyyy-MM-dd HH:mm:ss"))
    val parser = new LineParser(opts, opts.schema, Nil)
    val compiled = java.util.regex.Pattern.compile(Pattern)

    def time[A](warm: Int, runs: Int)(f: => A): Double = {
      (0 until warm).foreach(_ => f)
      (0 until runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    }

    val regexOnly = time(1, 3) {
      var sink = 0L
      var j = 0
      while (j < nLines) {
        val m = compiled.matcher(lines(j))
        if (m.find()) {
          var g = 1
          while (g <= m.groupCount()) { sink += m.group(g).length; g += 1 }
        }
        j += 1
      }
      sink
    }
    val parseFull = time(1, 3) {
      var sink = 0L
      var j = 0
      while (j < nLines) {
        val row = parser.parse(lines(j))
        if (row != null) sink += row.numFields
        j += 1
      }
      sink
    }
    // all-VARCHAR variant: regex + UTF8String + row alloc, NO timestamp/int
    // coercion — separates "materialization" from "coercion" in parse_full
    val vOpts = LogOptions.fromMap(Map(
      "pattern" -> Pattern,
      "fieldNames" -> "ts, event_type, event_id",
      "dataTypes" -> "VARCHAR, VARCHAR, VARCHAR"))
    val vParser = new LineParser(vOpts, vOpts.schema, Nil)
    val parseVarchar = time(1, 3) {
      var sink = 0L
      var j = 0
      while (j < nLines) {
        val row = vParser.parse(lines(j))
        if (row != null) sink += row.numFields
        j += 1
      }
      sink
    }

    // fast-reject stage (round-11): an unmatched-heavy corpus under a
    // literal-prefixed pattern — the case LineParser.literalPrefix targets.
    // `reject_regex_sec` is what Matcher.find alone pays over the corpus
    // (the pre-optimization cost); `reject_parse_sec` is LineParser.parse
    // WITH the startsWith pre-check. 90% of lines don't start with the
    // literal, so find()'s every-position retry dominates the former.
    val rejLines = new Array[String](nLines)
    i = 0
    while (i < nLines) {
      rejLines(i) =
        if (i % 10 == 0) s"ERROR: ${i % 1000} disk failure on node $i"
        else s"INFO request ${i} served in ${i % 90} ms by worker-${i % 7}"
      i += 1
    }
    // UNANCHORED literal start — the case where Matcher.find pays a scan
    // per position (the JDK short-circuits anchored '^' patterns itself)
    val rOpts = LogOptions.fromMap(Map(
      "pattern" -> "ERROR: (\\d+) (.+)",
      "fieldNames" -> "code, msg",
      "dataTypes" -> "INT, VARCHAR"))
    val rParser = new LineParser(rOpts, rOpts.schema, Nil)
    val rCompiled = java.util.regex.Pattern.compile("ERROR: (\\d+) (.+)")
    val rejectRegex = time(1, 3) {
      var sink = 0L
      var j = 0
      while (j < nLines) {
        val m = rCompiled.matcher(rejLines(j))
        if (m.find()) sink += m.group(1).length
        j += 1
      }
      sink
    }
    val rejectParse = time(1, 3) {
      var sink = 0L
      var j = 0
      while (j < nLines) {
        val row = rParser.parse(rejLines(j))
        if (row != null) sink += row.numFields
        j += 1
      }
      sink
    }

    // regexMaxSteps A/B (round-12): the budget wrapper routes every
    // regex-engine read through BudgetedChars.charAt (increment + compare
    // + delegate) instead of String.charAt. All-matching corpus = every
    // line runs a budgeted find() = the wrapper's worst case. Interleaved
    // same-process samples, min per side (box-noise discipline). This
    // measures the ENGAGED wrapper (explicit regexMaxSteps); the default
    // path on this benign pattern is the plain one — riskyPattern
    // auto-engagement means unflagged patterns pay nothing, which the
    // assert pins.
    require(!LineParser.riskyPattern(Pattern), "profile pattern should be benign")
    val bOnOpts = LogOptions.fromMap(Map(
      "pattern" -> Pattern,
      "fieldNames" -> "ts, event_type, event_id",
      "dataTypes" -> "TIMESTAMP, VARCHAR, INT",
      "dateFormat" -> "yyyy-MM-dd HH:mm:ss",
      "regexmaxsteps" -> "10000000"))
    val parserOn = new LineParser(bOnOpts, bOnOpts.schema, Nil)
    val parserOff = parser // default opts + benign pattern = plain path
    def parseAll(p: LineParser): Long = {
      var sink = 0L
      var j = 0
      while (j < nLines) {
        val row = p.parse(lines(j))
        if (row != null) sink += row.numFields
        j += 1
      }
      sink
    }
    parseAll(parserOn); parseAll(parserOff) // warm both paths
    var budgetOnMin = Double.MaxValue
    var budgetOffMin = Double.MaxValue
    (0 until 6).foreach { _ =>
      val t0 = System.nanoTime(); parseAll(parserOn)
      val t1 = System.nanoTime(); parseAll(parserOff)
      val t2 = System.nanoTime()
      budgetOnMin = math.min(budgetOnMin, (t1 - t0) / 1e9)
      budgetOffMin = math.min(budgetOffMin, (t2 - t1) / 1e9)
    }

    // end-to-end on a real file, through the DSV2 source vs text framing
    val dir = Files.createTempDirectory("graft_scanprofile")
    val file = dir.resolve("profile.log")
    val w = Files.newBufferedWriter(file, StandardCharsets.UTF_8)
    lines.foreach { l => w.write(l); w.write('\n') }
    w.close()

    val spark = SparkSession.builder().master("local[1]") // 1 core: per-line cost, not parallelism
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def readLog() = spark.read.format("log")
      .option("pattern", Pattern)
      .option("fieldNames", "ts, event_type, event_id")
      .option("dataTypes", "TIMESTAMP, VARCHAR, INT")
      .option("dateFormat", "yyyy-MM-dd HH:mm:ss")
      .load(file.toString)
    // count() prunes EVERY column (pushdown works), so it measures framing;
    // the all-columns aggregate is what forces the full parse per line
    val e2eCount = time(1, 3) { readLog().count() }
    val e2eAll = time(1, 3) {
      import org.apache.spark.sql.functions._
      readLog().agg(count(col("ts")), count(col("event_type")),
        sum(col("event_id")), count(col("unmatched_lines"))).collect()
    }
    val e2eText = time(1, 3) { spark.read.text(file.toString).count() }

    val perLine = (s: Double) => s * 1e9 / nLines
    println(f"""{"n_lines":$nLines,"regex_only_sec":$regexOnly%.3f,"parse_varchar_sec":$parseVarchar%.3f,"parse_full_sec":$parseFull%.3f,"materialize_sec":${parseVarchar - regexOnly}%.3f,"coerce_sec":${parseFull - parseVarchar}%.3f,"regex_pct_of_parse":${100 * regexOnly / parseFull}%.1f,"materialize_pct_of_parse":${100 * (parseVarchar - regexOnly) / parseFull}%.1f,"coerce_pct_of_parse":${100 * (parseFull - parseVarchar) / parseFull}%.1f,"e2e_log_count_sec":$e2eCount%.3f,"e2e_log_allcols_sec":$e2eAll%.3f,"e2e_text_sec":$e2eText%.3f,"regex_ns_per_line":${perLine(regexOnly)}%.0f,"parse_ns_per_line":${perLine(parseFull)}%.0f,"reject_regex_sec":$rejectRegex%.3f,"reject_parse_sec":$rejectParse%.3f,"reject_regex_ns_per_line":${perLine(rejectRegex)}%.0f,"reject_parse_ns_per_line":${perLine(rejectParse)}%.0f,"budget_on_sec":$budgetOnMin%.3f,"budget_off_sec":$budgetOffMin%.3f,"budget_overhead_pct":${100 * (budgetOnMin - budgetOffMin) / budgetOffMin}%.1f}""")

    spark.stop()
    Files.deleteIfExists(file)
    Files.deleteIfExists(dir)
  }
}
