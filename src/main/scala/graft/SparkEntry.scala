package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{RollingHashFingerprint, TextFunctions => TF}
import graft.ops.{Anonymize, AsOfJoin, Bfs, Boilerplate, Chunking, Dedup, Dsir, DupGroups, Multimodal, NgramLm, Packing, PageRank, PartitionedSink, QualityClassifier, Sampling, Similarity}

/** Driver contract — one `queries` entry per operator in SURVEY.md §2 plus
  * the north-star LLM-pipeline operators; `oracleSql` gives the equivalent
  * DuckDB SQL over the same parquet tables (omitted only where the operator
  * is intentionally not SQL-expressible, e.g. xxhash-seeded MinHash — those
  * get the driver's rows-only check and are gated by ScalaTest recall
  * specs instead).
  *
  * Conventions for oracle parity: every result is deterministically
  * ORDER BY'd, every double is round()'d, every derived integer is cast to
  * long (DuckDB integer functions return BIGINT), and column names are
  * aliased identically on both sides.
  */
object SparkEntry {

  // ---------------------------------------------------------------- helpers

  /** Engine-agnostic rounding: `floor(x*10^d + 0.5)/10^d` with identical
    * IEEE ops on both sides. Spark's round() (BigDecimal.valueOf shortest
    * repr, HALF_UP) and DuckDB's round() (binary multiply) disagree on
    * half-boundary doubles — this formula IS the cross-engine spec.
    */
  private def r(c: org.apache.spark.sql.Column, digits: Int) = {
    val p = math.pow(10, digits)
    floor(c * p + 0.5) / p
  }

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Small single-file inputs arrive as one partition; CPU-heavy per-row
    * pipelines (tokenize, hash, decode) need them spread across cores —
    * delegates to the ONE shared heuristic ([[Dedup.spreadDf]]).
    */
  private def spread(df: DataFrame): DataFrame = Dedup.spreadDf(df)

  /** events.parquet's `ts` physical encoding has drifted across testdata
    * generations (int64 nanoseconds vs native timestamp[us]); branch on the
    * loaded schema so both load to TimestampType with identical UTC
    * wall-clock. DuckDB reads the same file natively, so the oracle agrees
    * on either encoding.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    try t(spark, dir, "events")
    catch {
      // nanosecond-encoded parquet timestamps are rejected unless read as
      // raw longs; only flip the session flag when actually needed
      case e: Exception if e.getMessage != null && e.getMessage.contains("NANOS") =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        t(spark, dir, "events")
    }

  /** The TimestampType-producing conversion for a raw `ts` column of the
    * given loaded type. */
  private def eventsTsCol(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    dt match {
      case LongType =>
        // integer `div`, not `/`: double division rounds at 2^53 and 2024
        // epoch-nanos are ~1.7e18 (ulp 256 ns) — a boundary event could land
        // in the wrong window vs DuckDB's native ns truncation
        timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType | TimestampType =>
        // session TZ is pinned UTC, so NTZ wall-clock is preserved
        col("ts").cast(TimestampType)
      case other =>
        throw new IllegalStateException(s"unsupported events.ts encoding: $other")
    }
  }

  // private[graft]: EventsEncodingSpec drives this loader over fixture
  // parquet in each historical ts encoding
  private[graft] def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = eventsRaw(spark, dir)
    raw.withColumn("ts", eventsTsCol(raw.schema("ts").dataType))
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
  }

  /** The one /tmp-path key scheme for per-dir sinks and caches. Folds a
    * cheap content fingerprint (per-file name+length+mtime) into the key so
    * regenerated source data can never be served from a stale fixture cache
    * or collide with a checkpoint built against the old data.
    */
  private def tmpKey(dir: String): String = {
    val base = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty[java.io.File])
    val fp = files.filter(_.isFile).sortBy(_.getName)
      .foldLeft(1125899906842597L) { (h, f) =>
        ((h * 1000003L + f.getName.hashCode) * 1000003L + f.length()) *
          1000003L + f.lastModified()
      }
    base + "_" + java.lang.Long.toHexString(fp)
  }

  /** One-time /tmp materialization: contents are deterministic per key, so
    * a complete previous write (sentinel present — written last) is reused
    * and repeated bench runs never pay the sink write again.
    */
  private def oncePerDir(out: String, sentinel: String)(write: => Unit): String = {
    if (!new java.io.File(s"$out/$sentinel").exists()) write
    out
  }

  /** Synthesized log lines from the events table (deterministic
    * `format_string`), written as text and read back through the `log`
    * source — SURVEY.md §5.4's round-trip trick that makes the custom
    * source oracle-checkable: DuckDB reproduces the aggregate from the
    * events table directly.
    */
  private def logDir(spark: SparkSession, dir: String, flavor: String): String = {
    val out = s"/tmp/graft_logs/${tmpKey(dir)}_$flavor"
    if (new java.io.File(s"$out/_SUCCESS").exists()) return out
    val ev = events(spark, dir)
    val lines = flavor match {
      case "plain" =>
        ev.select(format_string("%d %s user=%d %.2f",
          col("event_id"), col("event_type"), col("user_id"), col("value")).as("value"))
      case "mixed" => // error-type events become non-matching garbage lines
        ev.select(
          when(col("event_type") === "error",
            concat(lit("!!corrupt "), col("props")))
            .otherwise(format_string("%d %s user=%d %.2f",
              col("event_id"), col("event_type"), col("user_id"), col("value")))
            .as("value"))
      case "dated" =>
        ev.select(format_string("%s %s evt=%d",
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"), col("event_type"), col("event_id"))
          .as("value"))
      case "plain_gz" | "plain_bz2" | "plain_many" =>
        // same lines as "plain": compressed (codec paths) or spread over
        // 16 files (multi-batch streaming admission)
        ev.select(format_string("%d %s user=%d %.2f",
          col("event_id"), col("event_type"), col("user_id"), col("value")).as("value"))
      case "plainlog" =>
        // same lines as "plain" but *.log-suffixed files: the direct-SQL
        // path query (q_log_sqlpath) uses `FROM log.`dir`` which carries
        // no options, so the DEFAULT extension (log) must match
        ev.select(format_string("%d %s user=%d %.2f",
          col("event_id"), col("event_type"), col("user_id"), col("value")).as("value"))
      case "hive" =>
        // hive-partitioned tree (dt=YYYY-MM-DD/part-*.txt via partitionBy):
        // the partition-column + file-pruning fixture (q_log_partitioned)
        ev.select(date_format(col("ts"), "yyyy-MM-dd").as("dt"),
          format_string("%d %s user=%d %.2f",
            col("event_id"), col("event_type"), col("user_id"), col("value")).as("value"))
      case "dirs" =>
        // PLAIN date tree (yyyy/MM/dd/part-*.txt — no k=v naming), the
        // Drill-workspace layout dirColumns exists for (q_log_dircols):
        // written via partitionBy, then each `k=v` level renamed bare
        ev.select(date_format(col("ts"), "yyyy").as("y"),
          date_format(col("ts"), "MM").as("m"),
          date_format(col("ts"), "dd").as("d"),
          format_string("%d %s user=%d %.2f",
            col("event_id"), col("event_type"), col("user_id"), col("value")).as("value"))
      case "multiline" =>
        // one 3-line record per event (value only on the tail line, so
        // extracting it REQUIRES record assembly); continuation lines are
        // space-indented so they can never match recordStartPattern ^\d+
        ev.select(format_string("%d %s user=%d\n  seq=%d\n  tail value=%.2f",
          col("event_id"), col("event_type"), col("user_id"),
          col("event_id"), col("value")).as("value"))
      case "apache" =>
        // apache_combined lines; every 10th request has bytes "-" (the
        // dialect's "no body" marker — INT parse of it must null, not die)
        ev.select(format_string(
          "10.0.0.%d - - [%s +0000] \"GET /%s HTTP/1.1\" %d %s \"-\" \"graft-bench\"",
          pmod(col("user_id"), lit(200)),
          date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss"),
          col("event_type"),
          when(col("event_type") === "error", 500).otherwise(200),
          when(col("event_id") % 10 === 0, lit("-"))
            .otherwise(floor(col("value") * 100).cast("long").cast("string")))
          .as("value"))
    }
    if (flavor.endsWith("_gz"))
      lines.write.mode("overwrite").option("compression", "gzip").text(out)
    else if (flavor.endsWith("_bz2"))
      lines.write.mode("overwrite").option("compression", "bzip2").text(out)
    else if (flavor.endsWith("_many"))
      lines.repartition(16).write.mode("overwrite").text(out)
    else if (flavor == "plainlog") {
      lines.write.mode("overwrite").text(out)
      // .txt -> .log (the text writer's extension is fixed); _SUCCESS
      // recreated LAST so a crash mid-rename can't leave a complete-
      // looking fixture
      val rootF = new java.io.File(out)
      new java.io.File(rootF, "_SUCCESS").delete()
      rootF.listFiles().filter(_.getName.endsWith(".txt")).foreach { f =>
        f.renameTo(new java.io.File(rootF, f.getName.stripSuffix(".txt") + ".log"))
      }
      new java.io.File(rootF, "_SUCCESS").createNewFile()
    } else if (flavor == "hive")
      lines.write.mode("overwrite").partitionBy("dt").text(out)
    else if (flavor == "dirs") {
      lines.write.mode("overwrite").partitionBy("y", "m", "d").text(out)
      // strip the k=v naming to bare segment names; _SUCCESS is recreated
      // LAST so a crash mid-rename can't leave a complete-looking fixture
      val rootF = new java.io.File(out)
      new java.io.File(rootF, "_SUCCESS").delete()
      def bare(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).filter(_.isDirectory).foreach { c =>
          bare(c)
          val eq = c.getName.indexOf('=')
          if (eq > 0) c.renameTo(new java.io.File(c.getParent, c.getName.substring(eq + 1)))
        }
      }
      bare(rootF)
      new java.io.File(rootF, "_SUCCESS").createNewFile()
    } else lines.write.mode("overwrite").text(out)
    out
  }

  // ---------------------------------------------------------------- entry

  /** Flagship: events → log lines → `log` source scan (regex extract +
    * typed coercion) → host aggregation. Exercises SURVEY.md §2A #1-#11
    * end-to-end on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    qLogParseAgg(spark, "/root/testdata/sf0.001")

  // ------------------------------------------------- log-source queries §2A

  private def qLogParseAgg(spark: SparkSession, dir: String): DataFrame = {
    val path = logDir(spark, dir, "plain")
    spark.read.format("log")
      .option("pattern", "(\\d+) (\\w+) user=(\\d+) ([0-9.]+)")
      .option("fieldNames", "event_id, event_type, user_id, value")
      .option("dataTypes", "INT, VARCHAR, INT, DOUBLE")
      .option("extensions", "txt")
      .load(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        r(sum("value"), 2).as("sum_value"),
        max("event_id").cast("long").as("max_event_id"))
      .orderBy("event_type")
  }

  /** Named-preset dialect parsing (`format=apache_combined`,
    * [[graft.log.LogOptions.Presets]]): real apache lines — including the
    * dialect's `-` "no body" marker, which must land as a NULL bytes
    * column under tolerant mode, not kill the scan — parsed with a
    * one-line config instead of hand-written pattern/fieldNames/
    * dataTypes. The TIMESTAMP column round-trips the bracketed
    * `dd/MMM/yyyy:HH:mm:ss Z` stamp; `max_hour` pins it.
    */
  private def qLogApache(spark: SparkSession, dir: String): DataFrame = {
    val path = logDir(spark, dir, "apache")
    spark.read.format("log")
      .option("format", "apache_combined")
      .option("extensions", "txt")
      .load(path)
      .groupBy(col("status").cast("long").as("status"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("bytes").isNull, 1L).otherwise(0L)).as("n_bytes_null"),
        sum(col("bytes").cast("long")).as("sum_bytes"),
        countDistinct(col("host")).as("n_hosts"),
        max(hour(col("ts"))).cast("long").as("max_hour"))
      .orderBy("status")
  }

  /** Partition-pruned scan ([[graft.log.PartitionValues]], the Spark-shaped
    * rebuild of Drill's `dir0`-style directory columns): a hive tree
    * `dt=YYYY-MM-DD/part-*.txt`, read with `partitionSchema=dt DATE`, a
    * one-week DATE range filter claimed as a PARTITION filter — 23 of the
    * 30 daily partitions are pruned at plan time, never listed into
    * chunks, opened, or regex-parsed. The `dt` group key costs nothing
    * per row (per-chunk constant). At 100 TB this is the dominant scan
    * lever: the same query over a year of logs touches ~1/52nd of the
    * corpus.
    */
  private def qLogPartitioned(spark: SparkSession, dir: String): DataFrame = {
    val path = logDir(spark, dir, "hive")
    spark.read.format("log")
      .option("pattern", "(\\d+) (\\w+) user=(\\d+) ([0-9.]+)")
      .option("fieldNames", "event_id, event_type, user_id, value")
      .option("dataTypes", "INT, VARCHAR, INT, DOUBLE")
      .option("partitionSchema", "dt DATE")
      .option("extensions", "txt")
      .load(path)
      .filter(col("dt").between(
        lit(java.sql.Date.valueOf("2024-01-08")),
        lit(java.sql.Date.valueOf("2024-01-14"))))
      .groupBy(date_format(col("dt"), "yyyy-MM-dd").as("dt"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        max("event_id").cast("long").as("max_event_id"),
        sum(col("user_id").cast("long")).as("sum_user_id"))
      .orderBy("dt", "event_type")
  }

  /** Positional dir columns ([[graft.log.PartitionValues]] dirColumns —
    * Drill's `dir0`/`dirN`, the plain `yyyy/MM/dd` tree with no `k=v`
    * naming): a week of day directories selected by a STRING range on
    * the day segment, claimed as partition filters — the other 23 day
    * dirs are pruned before any task launches.
    */
  private def qLogDircols(spark: SparkSession, dir: String): DataFrame = {
    val path = logDir(spark, dir, "dirs")
    spark.read.format("log")
      .option("pattern", "(\\d+) (\\w+) user=(\\d+) ([0-9.]+)")
      .option("fieldNames", "event_id, event_type, user_id, value")
      .option("dataTypes", "INT, VARCHAR, INT, DOUBLE")
      .option("dirColumns", "y, m, d")
      .option("extensions", "txt")
      .load(path)
      .filter(col("d") >= "08" && col("d") <= "14")
      .groupBy(col("d"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        max("event_id").cast("long").as("max_event_id"),
        sum(col("user_id").cast("long")).as("sum_user_id"))
      .orderBy("d", "event_type")
  }

  /** The direct-SQL surface end to end ([[graft.log.LogPathRelation]] +
    * the SQL-registered `parse_log_line`): `FROM log.`dir`` with the
    * default one-column schema, regex extraction and aggregation written
    * entirely in SQL — zero DataFrame code, Drill's ad-hoc usage mode.
    * Same readout as q_log_parse_agg's typed pipeline, so the oracle is
    * the events aggregate.
    */
  private def qLogSqlPath(spark: SparkSession, dir: String): DataFrame = {
    val path = logDir(spark, dir, "plainlog")
    spark.sql(
      raw"""SELECT g[1] AS event_type, count(*) AS n,
           |       max(cast(g[0] AS BIGINT)) AS max_event_id,
           |       cast(sum(cast(g[2] AS BIGINT)) AS BIGINT) AS sum_user_id
           |FROM (SELECT parse_log_line(line,
           |        '(\\d+) (\\w+) user=(\\d+) ([0-9.]+)') AS g
           |      FROM log.`$path`)
           |WHERE g IS NOT NULL
           |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  private def qLogUnmatched(spark: SparkSession, dir: String): DataFrame = {
    val path = logDir(spark, dir, "mixed")
    spark.read.format("log")
      .option("pattern", "(\\d+) (\\w+) user=(\\d+) ([0-9.]+)")
      .option("fieldNames", "event_id, event_type, user_id, value")
      .option("dataTypes", "INT, VARCHAR, INT, DOUBLE")
      .option("extensions", "txt")
      .load(path)
      .agg(
        count(col("event_type")).cast("long").as("n_matched"),
        count(col("unmatched_lines")).cast("long").as("n_unmatched"))
  }

  private def qLogTypedDates(spark: SparkSession, dir: String): DataFrame = {
    val path = logDir(spark, dir, "dated")
    spark.read.format("log")
      .option("pattern", "(\\S+) (\\d{2}:\\d{2}:\\d{2}) (\\w+) evt=(\\d+)")
      .option("fieldNames", "d, tm, event_type, event_id")
      .option("dataTypes", "DATE, TIME, VARCHAR, INT")
      .option("dateFormat", "yyyy-MM-dd")
      .option("timeFormat", "HH:mm:ss")
      .option("extensions", "txt")
      .load(path)
      .groupBy(date_format(col("d"), "yyyy-MM-dd").as("d")) // string: stable dtype across engines
      .agg(count(lit(1)).as("n"),
        min(col("tm")).cast("long").as("min_ms_of_day"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy("d")
  }

  /** TIMESTAMP coercion end-to-end (ref `LogRecordReader.java:256-267`):
    * the full date+time string is ONE capture group typed TIMESTAMP, parsed
    * with the shared `dateFormat` (the reference has no separate timestamp
    * format). Aggregates group on and emit the parsed timestamps.
    */
  private def qLogTimestamp(spark: SparkSession, dir: String): DataFrame = {
    val path = logDir(spark, dir, "dated")
    spark.read.format("log")
      .option("pattern", "(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}) (\\w+) evt=(\\d+)")
      .option("fieldNames", "ts, event_type, event_id")
      .option("dataTypes", "TIMESTAMP, VARCHAR, INT")
      .option("dateFormat", "yyyy-MM-dd HH:mm:ss")
      .option("extensions", "txt")
      .load(path)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("n"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("min_ts"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("max_ts"),
        min(col("event_id")).cast("long").as("min_event_id"))
      .orderBy("hour")
  }

  /** FAILFAST end-to-end over clean input (ref `LogRecordReader.java:283-292`
    * strict half): the query only succeeds if every line matches AND every
    * coercion succeeds — the oracle reproduces the aggregate, proving the
    * strict path ran to completion (the throwing cases are unit-tested).
    */
  private def qLogFailfast(spark: SparkSession, dir: String): DataFrame = {
    val path = logDir(spark, dir, "plain")
    spark.read.format("log")
      .option("pattern", "(\\d+) (\\w+) user=(\\d+) ([0-9.]+)")
      .option("fieldNames", "event_id, event_type, user_id, value")
      .option("dataTypes", "INT, VARCHAR, INT, DOUBLE")
      .option("extensions", "txt")
      .option("mode", "FAILFAST")
      .load(path)
      .groupBy((col("user_id") % 10).cast("long").as("user_bucket"))
      .agg(count(lit(1)).as("n"), r(sum("value"), 2).as("sum_value"))
      .orderBy("user_bucket")
  }

  /** Compressed-input codec path (ref `LogRecordReader.java:124-129`
    * decompress-on-read): same scan as q_log_parse_agg but over gzip'd
    * files — one non-splittable split per .gz file, codec-detected by
    * suffix; extension routing matches `*.txt.gz` against `txt`.
    */
  private def qLogGzip(spark: SparkSession, dir: String): DataFrame = {
    val path = logDir(spark, dir, "plain_gz")
    spark.read.format("log")
      .option("pattern", "(\\d+) (\\w+) user=(\\d+) ([0-9.]+)")
      .option("fieldNames", "event_id, event_type, user_id, value")
      .option("dataTypes", "INT, VARCHAR, INT, DOUBLE")
      .option("extensions", "txt")
      .load(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        r(max("value"), 2).as("max_value"),
        sum(col("user_id").cast("long")).as("sum_users"))
      .orderBy("event_type")
  }

  /** The NATIVE streaming source end-to-end ([[graft.log.LogMicroBatchStream]]):
    * `readStream.format("log")` tails the synthesized log directory with
    * `maxFilesPerTrigger` admission control (several bounded micro-batches,
    * not one unbounded backlog batch), parses each line through the same
    * regex/type pipeline as the batch scan, and aggregates with a complete-
    * mode memory sink (the oracle-harness shape — see q_streaming_sink for
    * the production append shape). The oracle recomputes the aggregate from
    * the events table the lines were synthesized from.
    */
  private def qLogStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    // 16 files + maxFilesPerTrigger=8 -> the drain really runs >1 batch
    val path = logDir(spark, dir, "plain_many")
    val stream = spark.readStream.format("log")
      .option("pattern", "(\\d+) (\\w+) user=(\\d+) ([0-9.]+)")
      .option("fieldNames", "event_id, event_type, user_id, value")
      .option("dataTypes", "INT, VARCHAR, INT, DOUBLE")
      .option("extensions", "txt")
      .option("maxFilesPerTrigger", "8")
      .load(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("user_id").cast("long")).as("sum_users"))
    // Memory-sink table name derived from the input dir: concurrent drains
    // over different dirs (parallel bench/test runs in one session) must not
    // collide on a duplicate active query name / shared complete-mode table.
    val sinkName = "graft_log_stream_out_" + tmpKey(path)
    // batch-sized state width ([[withShufflePartitionsCap]]): the
    // complete-mode aggregation instantiates one state store per shuffle
    // partition per batch — at the session's 32-wide default that is
    // 32 store open/commits per micro-batch for a 5-group aggregate; the
    // source's own parallelism (maxFilesPerTrigger splits) is unaffected
    withShufflePartitionsCap(spark, 8) {
      val q = stream.writeStream.outputMode("complete")
        .format("memory").queryName(sinkName)
        .trigger(Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(300000)) {
        q.stop()
        throw new IllegalStateException("[graft] q_log_stream drain timed out after 300 s")
      }
    }
    spark.table(sinkName).orderBy("event_type")
  }

  /** The SPLITTABLE compressed codec path: bzip2 files are chunked at
    * maxSplitBytes boundaries like uncompressed ones (gzip, above, stays
    * one-split-per-file) — the difference between one task per archive and
    * cluster-wide fan-out when someone hands the pipeline 100 TB of .bz2
    * logs. Split-boundary parity is spec-asserted (LogSourceSpec); here the
    * whole scan must reproduce the gzip query's aggregate exactly.
    */
  private def qLogBzip2(spark: SparkSession, dir: String): DataFrame = {
    val path = logDir(spark, dir, "plain_bz2")
    spark.read.format("log")
      .option("pattern", "(\\d+) (\\w+) user=(\\d+) ([0-9.]+)")
      .option("fieldNames", "event_id, event_type, user_id, value")
      .option("dataTypes", "INT, VARCHAR, INT, DOUBLE")
      .option("extensions", "txt")
      .load(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        r(max("value"), 2).as("max_value"),
        sum(col("user_id").cast("long")).as("sum_users"))
      .orderBy("event_type")
  }

  /** In-reader predicate pushdown (SURVEY.md §4.1 optional item, now
    * implemented): both conjuncts are claimed by the scan, evaluated inside
    * [[graft.log.LineParser]] before row materialization — non-qualifying
    * lines never become rows. Result identical to Catalyst filtering (the
    * oracle proves it); `LogPushdownSpec`/`PlanSpec` assert the plan shape.
    */
  private def qLogPushdown(spark: SparkSession, dir: String): DataFrame = {
    val path = logDir(spark, dir, "plain")
    spark.read.format("log")
      .option("pattern", "(\\d+) (\\w+) user=(\\d+) ([0-9.]+)")
      .option("fieldNames", "event_id, event_type, user_id, value")
      .option("dataTypes", "INT, VARCHAR, INT, DOUBLE")
      .option("extensions", "txt")
      .load(path)
      .filter(col("event_type") === "click" && col("user_id") < 500)
      .groupBy((col("user_id") % 10).cast("long").as("user_bucket"))
      .agg(count(lit(1)).as("n"), r(sum("value"), 2).as("sum_value"))
      .orderBy("user_bucket")
  }

  /** Multi-line records (beyond-reference — the reference is strictly
    * line-framed, `LogRecordReader.java:212`): `recordStartPattern` frames
    * each 3-line synthesized record (stack-trace / MySQL-slow-query shape),
    * and the parse pattern extracts `value` from the TAIL line — a match is
    * impossible without correct record assembly, including records that
    * straddle file-split boundaries (LogSourceSpec forces tiny splits; here
    * the normal split sizing applies). The oracle recomputes the aggregate
    * from the events table the records were synthesized from.
    */
  private def qLogMultiline(spark: SparkSession, dir: String): DataFrame = {
    val path = logDir(spark, dir, "multiline")
    spark.read.format("log")
      .option("pattern", "(?s)(\\d+) (\\w+) user=(\\d+)\\n  seq=\\d+\\n  tail value=([0-9.]+)")
      .option("recordStartPattern", "^\\d+ ")
      .option("fieldNames", "event_id, event_type, user_id, value")
      .option("dataTypes", "INT, VARCHAR, INT, DOUBLE")
      .option("extensions", "txt")
      .load(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        r(sum("value"), 2).as("sum_value"),
        max("event_id").cast("long").as("max_event_id"))
      .orderBy("event_type")
  }

  /** DROPMALFORMED mode (CSV-parity third mode, beyond-reference): corrupt
    * lines are dropped by the reader instead of routed to
    * `unmatched_lines`; the oracle keeps exactly the non-corrupt events.
    */
  private def qLogDropMalformed(spark: SparkSession, dir: String): DataFrame = {
    val path = logDir(spark, dir, "mixed")
    spark.read.format("log")
      .option("pattern", "(\\d+) (\\w+) user=(\\d+) ([0-9.]+)")
      .option("fieldNames", "event_id, event_type, user_id, value")
      .option("dataTypes", "INT, VARCHAR, INT, DOUBLE")
      .option("extensions", "txt")
      .option("mode", "DROPMALFORMED")
      .load(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), r(sum("value"), 2).as("sum_value"))
      .orderBy("event_type")
  }

  // ------------------------------------------------ relational surface §2B

  private def q1Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        r(sum("l_quantity"), 2).as("sum_qty"),
        r(sum("l_extendedprice"), 2).as("sum_base"),
        r(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
        r(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  private def qFilterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_quantity").between(10, 20) && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
      .orderBy("l_orderkey", "l_linenumber")
      .limit(200)

  private def qJoinBroadcast(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), r(sum("l_extendedprice"), 2).as("sum_price"))
      .orderBy("p_brand")

  private def qJoin5Way(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(r(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("r_name", "n_name")

  private def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = t(spark, dir, "orders").filter(col("o_totalprice") > 200000)
    t(spark, dir, "customer")
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
  }

  private def qAntiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders").filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), r(sum("c_acctbal"), 2).as("sum_bal"))
      .orderBy("c_mktsegment")

  private def qWindowTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk").cast("long").as("rk"), col("o_orderkey"),
        col("o_totalprice").as("price"))
      .orderBy("o_custkey", "rk")
  }

  private def qWindowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
    t(spark, dir, "lineitem")
      .withColumn("prev_ship", lag(col("l_shipdate"), 1).over(w))
      .withColumn("gap_days", datediff(col("l_shipdate"), col("prev_ship")))
      .groupBy("l_suppkey")
      .agg(count(col("gap_days")).as("n_gaps"),
        r(avg(col("gap_days")), 4).as("avg_gap"),
        max(col("gap_days")).cast("long").as("max_gap"))
      .orderBy("l_suppkey")
  }

  private def qRollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), r(sum("l_quantity"), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy("rf", "ls")

  private def qCube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pr"),
        col("n"))
      .orderBy("st", "pr")

  private def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), r(sum("o_totalprice"), 2).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pr"),
        col("n"), col("sum_price"))
      .orderBy("st", "pr")

  private def qJsonExtract(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("k",
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").cast("long"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), countDistinct(col("k")).as("n_k"),
        max(get_json_object(col("props"), "$.k").cast("long")).as("max_k"))
      .orderBy("event_type")

  private def qSupplierTopk(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy("s_name", "n_name")
      .agg(r(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("s_name"))
      .limit(10)

  /** HLL sketch (approx_count_distinct) next to the exact count — the
    * scale path for distinct counting. Sketch families differ across
    * engines, so the oracle checks the INVARIANT: the sketch lands within
    * its 5% error envelope of the exact count (which the oracle reproduces
    * exactly); tighter rsd accuracy is spec-gated in ScalaTest.
    */
  private def qHll(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("__approx"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(col("l_returnflag"), col("exact_orders"),
        (abs(col("__approx") - col("exact_orders")).cast("double") /
          col("exact_orders").cast("double") <= 0.05).as("within_5pct"))
      .orderBy("l_returnflag")

  /** Mergeable HLL sketches (DataSketches `hll_sketch_agg` /
    * `hll_union_agg`) — the way distinct counts actually run at 100 TB:
    * one sketch per shard/partition/snapshot, persisted as a binary
    * column, unioned later WITHOUT revisiting the data. Here: per-language
    * source sketches unioned into the corpus-wide distinct-source count.
    * Sketch bytes differ across engines, so the oracle checks the
    * invariants — per-language estimates and the post-union estimate match
    * the exact counts the oracle recomputes (HLL at lgK=12 is exact at
    * these cardinalities; large-corpus error bounds are spec-gated).
    */
  private def qHllSketchUnion(spark: SparkSession, dir: String): DataFrame = {
    val perLang = t(spark, dir, "documents")
      .groupBy("lang")
      .agg(hll_sketch_agg(col("source"), lit(12)).as("__sk"),
        countDistinct(col("source")).as("n_exact"))
    perLang
      .agg(count(lit(1)).as("n_shards"),
        sum(when(hll_sketch_estimate(col("__sk")) === col("n_exact"), 1L)
          .otherwise(0L)).as("n_shard_ok"),
        hll_sketch_estimate(hll_union_agg(col("__sk"), lit(false)))
          .as("union_distinct"))
  }

  /** Session windows (30-minute gap) over the events stream-table; the
    * oracle reproduces sessionization with the lag/cumsum islands trick.
    */
  private def qSessionWindow(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        max("n_events").as("max_session_events"))
      .orderBy("user_id")

  /** Exact interpolated percentiles (Spark `percentile` == DuckDB
    * `quantile_cont`: lower + (upper-lower)*frac on the sorted values).
    */
  private def qPercentile(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(r(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        r(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** APPROXIMATE percentiles (Spark's approx_percentile sketch) graded
    * like q_hll: the oracle reproduces the EXACT per-group median and n;
    * the in-query invariant asserts the sketch lands within the rank-error
    * bound (accuracy 10000 → eps = 1/10000, checked against the exact
    * value-range envelope at p±2eps computed in-query). At 100 TB the
    * sketch is the only affordable option — mergeable partial state per
    * task vs a full sort per group for the exact form.
    */
  private def qApproxPercentile(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      // ONE exact-percentile aggregate with an array of fractions — three
      // separate percentile() calls would each buffer every group value
      .agg(expr("percentile(l_extendedprice, array(0.4998, 0.5, 0.5002))").as("__p"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("__a"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        r(element_at(col("__p"), 2), 4).as("exact_p50"),
        col("n"),
        (col("__a") >= element_at(col("__p"), 1) &&
          col("__a") <= element_at(col("__p"), 3)).as("within_rank_bound"))
      .orderBy("l_returnflag")

  /** Hourly-count anomaly detection per event type: hours at >= 2x the
    * type's mean hourly rate. The comparison is INTEGER arithmetic
    * (n * n_hours >= 2 * total), so the threshold is bit-exact across
    * engines — no FP boundary can flip a row.
    */
  private def qEventAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type")
    hourly
      .withColumn("tot", sum("n").over(w))
      .withColumn("nh", count(lit(1)).over(w))
      .filter(col("n") * col("nh") >= col("tot") * 2)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_anomalous_hours"), max("n").as("max_hourly"))
      .orderBy("event_type")
  }

  /** [[qEventAnomaly]]'s integer-arithmetic anomaly shape over the
    * documents family: per-language source profile counting sources at
    * >= 2x the language's mean docs-per-source. Emits one row per language
    * unconditionally (a zero count is still a row), so the query grades the
    * threshold arithmetic even on a uniform corpus.
    */
  private def qDocAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val perSrc = t(spark, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang")
    perSrc
      .withColumn("tot", sum("n").over(w))
      .withColumn("ns", count(lit(1)).over(w))
      .groupBy("lang")
      .agg(
        sum(when(col("n") * col("ns") >= col("tot") * 2, 1L).otherwise(0L))
          .as("n_hot_sources"),
        max("n").as("max_n"))
      .orderBy("lang")
  }

  /** Time-series gap-filling (resample): each event type's observed hourly
    * counts joined onto its complete hour spine, missing hours filled with
    * zero. The spine is a per-key `sequence()` explode — bounded by the
    * key's time range, fully distributed, no driver-side calendar loop —
    * and the fill join is a plain equi-join on (type, hour), so the shape
    * survives any number of keys at 100 TB. Summarized per type to keep
    * the result compact.
    */
  private def qGapFill(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val spine = hourly.groupBy("event_type")
      .agg(min("hour").as("h0"), max("hour").as("h1"))
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    spine.join(hourly, Seq("event_type", "hour"), "left")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum(when(col("n").isNull, 1L).otherwise(0L)).as("n_gap_hours"),
        sum(coalesce(col("n"), lit(0L))).as("n_events"))
      .orderBy("event_type")
  }

  /** Robust outlier detection per event type: an hour is an outlier when
    * its count's absolute deviation from the type's MEDIAN exceeds 3x the
    * median absolute deviation (MAD) — the classic robust z-score, immune
    * to the mean-dragging that defeats [[qEventAnomaly]]'s 2x-mean rule on
    * heavy-tailed rates. Medians of small integers interpolate to exact
    * halves and MADs of those to exact quarters — both engines' linear
    * interpolation is exact binary arithmetic there, so scaling deviations
    * by 4 and their median by a further 2 turns the whole rule into
    * bit-exact INTEGER comparisons (2*dev4 > 3*mad8). The med/mad side
    * frames are bounded by the type count, so both join back by broadcast.
    */
  private def qMadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val med = hourly.groupBy("event_type")
      .agg(expr("percentile(n, 0.5d)").as("med"))
    // dev4 = 4*|n - med| is always integral (med is a half-integer)
    val dev = hourly.join(broadcast(med), "event_type")
      .withColumn("dev4", (abs(col("n") - col("med")) * 4).cast("long"))
    // the median of integers interpolates to a half-integer: 2x is integral
    val mad = dev.groupBy("event_type")
      .agg((expr("percentile(dev4, 0.5d)") * 2).cast("long").as("mad8"))
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum(when(col("dev4") * 2 > col("mad8") * 3, 1L).otherwise(0L))
          .as("n_outlier_hours"),
        (max("med") * 2).cast("long").as("med2"),
        max("mad8").as("mad8"))
      .orderBy("event_type")
  }

  /** Interval-union coverage per event type: each event opens a half-open
    * activity interval `[ts, ts + 1s + value/10 s)` and the readout is the
    * exact total duration covered by AT LEAST ONE interval — the
    * distributed sweep from [[graft.ops.IntervalCoverage]]. A naive sweep
    * is a per-type GLOBAL sort (one task per type at scale); the operator
    * clips intervals to p90-length-derived buckets so the window runs per
    * (type, bucket) and the per-group total is an exact sum of disjoint
    * per-bucket unions. All arithmetic is integer microseconds; the
    * duration mantissa is floor'd before widening so both engines build
    * identical interval ends.
    */
  private def qIntervalCoverage(spark: SparkSession, dir: String): DataFrame = {
    val iv = events(spark, dir)
      .withColumn("end_ts", timestamp_micros(
        unix_micros(col("ts")) + lit(1000000L) +
          floor(col("value") * 100000).cast("long")))
    graft.ops.IntervalCoverage
      .coverageAutoBucket(iv, Seq("event_type"), "ts", "end_ts")
      .orderBy("event_type")
  }

  /** CDC log compaction ([[graft.ops.CdcApply]]): the events stream read
    * as a change log — each user's signup seeds the base snapshot, later
    * events upsert their (type, value) payload, `error` events are delete
    * tombstones — compacted to the final per-user state by one `max_by`
    * hash aggregate + one full-outer join (no window over the log).
    * (ts, event_id) is the total order, so out-of-order arrival is
    * irrelevant. Readout: per surviving last-event-type counts plus
    * floor-scaled integer value sums.
    */
  private def qCdcApply(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val base = ev.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min_by(struct(col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("__first"))
      .select(col("user_id"), col("__first.event_type").as("event_type"),
        col("__first.value").as("value"))
    val log = ev.filter(col("event_type") =!= "signup")
      .withColumn("op",
        when(col("event_type") === "error", "delete").otherwise("upsert"))
    val fin = graft.ops.CdcApply.compact(
      base, log, Seq("user_id"), Seq("ts", "event_id"),
      "op", "delete", Seq("event_type", "value"))
    fin.groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        sum(floor(col("value") * 1000000).cast("long")).as("sum_value_u"))
      .orderBy("event_type")
  }

  /** Per-group closed-form least squares (trend detection): the slope of
    * each event type's hourly count over time, computed as the exact
    * integer numerator/denominator pair of the OLS closed form —
    * `slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` — with x the hour index
    * RELATIVE to the type's first hour (small integers, so every moment
    * is an exact long both engines agree on). ONE aggregation pass over
    * the hourly counts; the ppm readout is integer division. The
    * map-side-combinable moment sums are the only state — the same shape
    * at 100 TB.
    */
  private def qTrend(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("y"))
    val h0 = hourly.groupBy("event_type").agg(min("hour").as("h0"))
    val xy = hourly.join(broadcast(h0), "event_type")
      .withColumn("x", expr("(unix_micros(hour) - unix_micros(h0)) div 3600000000"))
    xy.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .select(col("event_type"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
      .withColumn("slope_ppm",
        when(col("slope_den") > 0,
          expr("slope_num * 1000000 div slope_den")))
      .orderBy("event_type")
  }

  /** Chi-squared association between event type and hour-of-day — the
    * data-profiling independence probe ("is activity shape uniform
    * across types?"). Observed and marginal counts are exact integers;
    * each cell's statistic is the IDENTICAL IEEE sequence on both
    * engines — every product is computed DOUBLE-FIRST
    * (`O_d·T − R_d·C`, `(R_d·C)·T`) so no intermediate can overflow a
    * long at any corpus size (a long product would wrap in Spark and
    * raise in DuckDB two orders of magnitude before the double-rounding
    * envelope matters), then `floor(1e6·d·d/den)` is integer-summed —
    * the scaled chi² is bit-exact cross-engine. One count aggregate +
    * two bounded marginal frames joined back by broadcast.
    */
  private def qChi2(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_type"), hour(col("ts")).cast("long").as("hod"))
    val obs = ev.groupBy("event_type", "hod").agg(count(lit(1)).as("o"))
    val rowM = obs.groupBy("event_type").agg(sum("o").as("r"))
    val colM = obs.groupBy("hod").agg(sum("o").as("c"))
    val tot = obs.agg(sum("o").as("t"))
    val cells = obs
      .join(broadcast(rowM), "event_type")
      .join(broadcast(colM), "hod")
      .crossJoin(broadcast(tot))
      .withColumn("d",
        col("o").cast("double") * col("t") - col("r").cast("double") * col("c"))
      .withColumn("cell_u",
        floor(lit(1e6) * col("d") * col("d") /
          (col("r").cast("double") * col("c") * col("t"))).cast("long"))
    cells.groupBy("event_type")
      .agg(count(lit(1)).as("n_cells"), sum("cell_u").as("chi2_u"))
      .orderBy("event_type")
  }

  /** STREAMING CDC materialization ([[graft.ops.CdcApply]] inside
    * `foreachBatch`): the time-chunked event stream applied batch-by-batch
    * onto a keyed parquet snapshot — upserts replace, `error` tombstones
    * delete, each micro-batch runs one compact + a temp-write-and-swap of
    * the snapshot (the BandPostings save-back pattern; at real scale the
    * swap narrows to touched partitions via [[PartitionedSink]]).
    * Because batches arrive in time order and [[CdcApply.compact]] is
    * last-writer-wins by (ts, event_id) WITHIN a batch, the sequential
    * fold equals the one-shot batch compaction — so the oracle is
    * q_cdc_apply's, reproduced on the same readout.
    */
  private def qStreamingCdc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = streamChunksDir(spark, dir)
    val snapBase = s"/tmp/graft_streamcdc/${tmpKey(dir)}"
    deleteRec(new java.io.File(snapBase)) // rebuild per run: the drain IS the query
    val snapDir = s"$snapBase/snap"
    val ev = events(spark, dir)
    // seed snapshot at the same capped width as the batches below — a
    // 32-file seed makes every subsequent batch pay a 32-file listing+read
    withShufflePartitionsCap(spark, 8) {
      ev.filter(col("event_type") === "signup")
        .groupBy("user_id")
        .agg(min_by(struct(col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("__first"))
        .select(col("user_id"), col("__first.event_type").as("event_type"),
          col("__first.value").as("value"))
        .write.mode("overwrite").parquet(snapDir)
    }
    val ckpt = graft.Scratch.ephemeralCkptDir("graft_streamcdc_ckpt").toString
    val stream = spark.readStream
      .schema("event_id LONG, event_type STRING, user_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .filter(col("event_type") =!= "signup")
      .withColumn("op",
        when(col("event_type") === "error", "delete").otherwise("upsert"))
    val q = stream.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // batch-sized width ([[withShufflePartitionsCap]]): the compact's
        // aggregate + full-outer join and the snapshot rewrite all ran at
        // the session's 32-wide default per micro-batch — 32-way shuffles
        // over trigger-sized frames AND a 32-file snapshot that the NEXT
        // batch pays to list and read; 8 tracks the batch volume
        withShufflePartitionsCap(spark, 8) {
          val cur = spark.read.parquet(snapDir)
          val next = graft.ops.CdcApply.compact(
            cur, batch.toDF(), Seq("user_id"), Seq("ts", "event_id"),
            "op", "delete", Seq("event_type", "value"))
          val tmp = s"$snapBase/snap_next"
          next.write.mode("overwrite").parquet(tmp)
          deleteRec(new java.io.File(snapDir))
          if (!new java.io.File(tmp).renameTo(new java.io.File(snapDir)))
            throw new IllegalStateException("snapshot swap failed")
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000)) {
        q.stop()
        throw new IllegalStateException("[graft] q_streaming_cdc drain timed out")
      }
    } finally deleteRec(new java.io.File(ckpt)) // one-shot either way
    spark.read.parquet(snapDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        sum(floor(col("value") * 1000000).cast("long")).as("sum_value_u"))
      .orderBy("event_type")
  }

  /** Time-weighted average (irregular-sample metric aggregation): each
    * event's value holds until the user's NEXT event (`lead` window,
    * partitioned per user — bounded state, no global sort), weighted by
    * that holding duration. All integer arithmetic at a precision chosen
    * to bound the sums: value in centi-units (×100) times duration in
    * SECONDS keeps the corpus numerator orders of magnitude inside a
    * long; the ppm readout splits the scaled division as
    * `q·1e6 + (r·1e6 div den)` (with `num = q·den + r`) — exactly
    * `floor(num·1e6/den)` but with no overflowable `num·1e6`
    * intermediate.
    */
  private def qTimeWeighted(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .withColumn("next_us", lead(unix_micros(col("ts")), 1).over(byUser))
      .filter(col("next_us").isNotNull)
      .withColumn("gap_s",
        expr("(next_us - unix_micros(ts)) div 1000000"))
      .withColumn("vc", floor(col("value") * 100).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_held"),
        sum(col("vc") * col("gap_s")).as("num_cs"),
        sum("gap_s").as("den_s"))
      .withColumn("twa_cppm",
        when(col("den_s") > 0,
          expr("(num_cs div den_s) * 1000000 + (num_cs % den_s) * 1000000 div den_s")))
      .orderBy("event_type")
  }

  /** Spark 4.x `transformWithState` arbitrary stateful streaming
    * ([[graft.streaming.RunningTotals]] — the StatefulProcessor
    * successor to the legacy `flatMapGroupsWithState` that
    * [[qSessionizeCustom]] covers): per-user running (count, Σvalue_u)
    * emitting one cumulative row per key per touched micro-batch, state
    * in the REQUIRED RocksDB store (conf scoped set→drain→restore).
    * Emissions carry cumulative totals, so the per-key MAX over all
    * emissions equals the batch aggregate no matter how the stream was
    * chunked — the identity the oracle pins.
    */
  private def qTransformState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val srcDir = streamChunksDir(spark, dir)
    val base = s"/tmp/graft_tws/${tmpKey(dir)}"
    deleteRec(new java.io.File(base)) // the drain is the query
    val sink = s"$base/sink"
    withRocksDbStateStore(spark) {
      // 4 files/trigger -> 2 data batches: cross-batch state accumulation
      // is still exercised (the point of the query) without paying the
      // RocksDB store open/changelog-commit cycle 6 more times — the
      // q_streaming_join batch-count rationale. The declared result is
      // batching-INVARIANT by construction: emissions are cumulative and
      // the readout takes the per-key MAX, the identity the oracle pins
      // (JobProfile r17: 8 batches ran 0.21-0.75 s each, ~85% store
      // open/commit + planning on 2-partition state).
      val stream = spark.readStream
        .schema("event_id LONG, event_type STRING, user_id LONG, ts TIMESTAMP, value DOUBLE")
        .option("maxFilesPerTrigger", 4)
        .parquet(srcDir)
        .select(col("user_id").as("k"),
          floor(col("value") * 1000000).cast("long").as("inc"))
        .as[graft.streaming.RunningTotals.In]
      drainAppendToParquet(graft.streaming.RunningTotals(stream).toDF(),
        sink, "q_transform_state", statePartitionCap = Some(2))
    }
    spark.read.parquet(sink)
      .groupBy("k")
      .agg(max("n").as("n_events"), max("total").as("total_u"))
      .groupBy("n_events")
      .agg(count(lit(1)).as("n_users"), sum("total_u").as("sum_total_u"))
      .orderBy("n_events")
  }

  /** MapState running counts ([[graft.streaming.TypeCounts]]): per-user
    * event-type map maintained sub-key-at-a-time on the transformWithState
    * MapState primitive — cumulative emissions, so MAX per (user, type)
    * over all emissions equals the batch aggregate regardless of
    * chunking (the q_transform_state identity, now for keyed maps).
    */
  private def qMapState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val srcDir = streamChunksDir(spark, dir)
    val base = s"/tmp/graft_mapstate/${tmpKey(dir)}"
    deleteRec(new java.io.File(base))
    val sink = s"$base/sink"
    withRocksDbStateStore(spark) {
      // 2 data batches, not 8 — the q_transform_state batch-count
      // rationale; per-(user,type) counts are order-free, so the max-over-
      // emissions identity is batching-invariant
      val stream = spark.readStream
        .schema("event_id LONG, event_type STRING, user_id LONG, ts TIMESTAMP, value DOUBLE")
        .option("maxFilesPerTrigger", 4)
        .parquet(srcDir)
        .select(col("user_id").as("userId"), col("event_type").as("eventType"))
        .as[graft.streaming.TypeCounts.In]
      drainAppendToParquet(graft.streaming.TypeCounts(stream).toDF(),
        sink, "q_map_state", statePartitionCap = Some(2))
    }
    spark.read.parquet(sink)
      .groupBy("userId", "eventType")
      .agg(max("n").as("n"))
      .groupBy(col("eventType").as("event_type"))
      .agg(count(lit(1)).as("n_pairs"), sum("n").as("n_events"))
      .orderBy("event_type")
  }

  /** Deterministic pseudonymization (PII-safe export, the tokenization
    * sibling of [[qPiiRedact]]'s destructive redaction): identities are
    * replaced by `md5(salt ':' id)` prefixes — the cross-engine
    * pseudo-random contract [[Sampling]] already pins — and the readout
    * PROVES referential integrity survives: events joined to the order
    * side ON THE PSEUDONYM reproduce exactly the raw-key join. Pure
    * scan-side projection (no shuffle added beyond the join being
    * audited); salt rotation = new pseudonym universe.
    */
  private def qPseudonymize(spark: SparkSession, dir: String): DataFrame = {
    def pseudo(c: org.apache.spark.sql.Column) =
      substring(md5(concat(lit("s9:"), c.cast("string")).cast("binary")), 1, 16)
    val ev = events(spark, dir)
      .select(pseudo(col("user_id")).as("p"), col("event_type"))
    val cust = t(spark, dir, "orders")
      .select(pseudo(col("o_custkey")).as("p")).distinct()
    ev.join(cust, "p")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_matched"),
        countDistinct(col("p")).as("n_pseudonyms"))
      .orderBy("event_type")
  }

  /** Islands-and-gaps (longest streak): each user's longest run of
    * consecutive same-type events in time order — the classic gaps/
    * islands decomposition, `rn_global − rn_per_type` as the island key,
    * with BOTH window passes partitioned by user (no global sort; a
    * user's history is the bounded unit of work, the same contract as
    * sessionization). Readout compacted per event type: users whose
    * longest streak is that type, max/total streak stats — all integers.
    */
  private def qStreaks(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val byUserType = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    val islands = events(spark, dir)
      .withColumn("rn", row_number().over(byUser))
      .withColumn("rnt", row_number().over(byUserType))
      .withColumn("island", col("rn") - col("rnt"))
      .groupBy("user_id", "event_type", "island")
      .agg(count(lit(1)).as("len"))
    // per user: the longest island — deterministic tie-break on
    // (event_type, island); rank-1 filter compiles to WindowGroupLimit
    val wBest = Window.partitionBy("user_id")
      .orderBy(col("len").desc, col("event_type").asc, col("island").asc)
    val best = islands
      .withColumn("rk", row_number().over(wBest)).filter(col("rk") === 1)
      .select(col("user_id"), col("len").as("best_len"),
        col("event_type").as("best_type"))
    best.groupBy(col("best_type").as("event_type"))
      .agg(count(lit(1)).as("n_users"), max("best_len").as("max_streak"),
        sum("best_len").as("sum_streak"))
      .orderBy("event_type")
  }

  /** Relational PIVOT: the hour-of-day x event-type count matrix with an
    * EXPLICIT pivot domain — at 100 TB the value list is configuration,
    * not a driver-side distinct-discovery pass (which `pivot(col)` without
    * values would run). Absent cells are true zeros.
    */
  private def qPivot(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("hod", hour(col("ts")).cast("long"))
      .groupBy("hod")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy("hod")

  /** UNPIVOT (melt) — the inverse of [[qPivot]]'s explicit-domain pivot:
    * the hour x type count matrix melted back to long form and
    * re-aggregated per type. Spark's `unpivot` plans as a single Expand
    * (no join, no shuffle beyond the final aggregate); ids/values/names
    * are explicit — nothing is inferred at plan time from data.
    */
  private def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = events(spark, dir)
      .withColumn("hod", hour(col("ts")).cast("long"))
      .groupBy("hod")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
    wide.unpivot(Array(col("hod")),
        Array(col("click"), col("error"), col("purchase"), col("signup"), col("view")),
        "event_type", "n")
      .groupBy("event_type")
      .agg(sum("n").as("n_events"),
        sum(when(col("n") === 0, 1L).otherwise(0L)).as("n_empty_hours"),
        max("n").as("max_hourly"))
      .orderBy("event_type")
  }

  /** Typed JSON extraction via `from_json` with a DECLARED schema (the
    * plan-time-typed sibling of [[qJsonExtract]]'s path extraction):
    * props parsed to a struct column once, fields projected as native
    * ints — codegen'd JacksonParser, no per-field re-parse.
    */
  private def qJsonStruct(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("j", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("j.k").cast("long")).as("sum_k"),
        max(col("j.k")).cast("long").as("max_k"),
        sum(when(col("j.k").isNull, 1L).otherwise(0L)).as("n_null_k"))
      .orderBy("event_type")

  /** Conversion funnel: each user's FIRST click, converted if a purchase
    * follows within 7 days, cohorted by first-click day. Two bounded
    * aggregates (one row per user) + one equi-join; the gap readout is
    * integer minutes (`div`), so every column is bit-exact cross-engine.
    */
  private def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val c = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min("ts").as("c0"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") >= col("c0") && col("ts") <= col("c0") + expr("INTERVAL 7 DAYS"))
      .groupBy(col("user_id")).agg(min("ts").as("p0"))
    c.join(p, Seq("user_id"), "left")
      .groupBy(to_date(col("c0")).cast("string").as("cohort_day"))
      .agg(count(lit(1)).as("n_clickers"),
        sum(when(col("p0").isNotNull, 1L).otherwise(0L)).as("n_converted"),
        sum(when(col("p0").isNotNull,
          expr("(unix_micros(p0) - unix_micros(c0)) div 60000000")).otherwise(0L))
          .as("sum_gap_min"))
      .orderBy("cohort_day")
  }

  /** Strict 3-step ordered funnel (click → view → purchase, each stage
    * strictly after the previous, conversion bounded to 7 days from the
    * first click) — the K-stage generalization of [[qFunnel]]. Each stage
    * is one bounded per-user aggregate (min event time after the previous
    * stage's time) chained by equi-joins on user — no window over the
    * event stream, no range join; the chain extends to any K with K
    * aggregates.
    */
  private def qFunnel3(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val c = ev.filter(col("event_type") === "click")
      .groupBy("user_id").agg(min("ts").as("c0"))
    val v = ev.filter(col("event_type") === "view")
      .join(c, "user_id").filter(col("ts") > col("c0"))
      .groupBy("user_id").agg(min("ts").as("v0"), min("c0").as("c0"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(v, "user_id")
      .filter(col("ts") > col("v0") && col("ts") <= col("c0") + expr("INTERVAL 7 DAYS"))
      .groupBy("user_id").agg(min("ts").as("p0"))
    c.join(v.select(col("user_id"), col("v0")), Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .groupBy(to_date(col("c0")).cast("string").as("cohort_day"))
      .agg(count(lit(1)).as("n_clicked"),
        sum(when(col("v0").isNotNull, 1L).otherwise(0L)).as("n_viewed"),
        sum(when(col("p0").isNotNull, 1L).otherwise(0L)).as("n_converted"))
      .orderBy("cohort_day")
  }

  /** Benford first-digit conformance — the classic fabricated-data /
    * corruption screen over a monetary column. Expected shares are a
    * LITERAL ppm table (`floor(log10(1+1/d)·1e6+0.5)`, the same
    * literal-weights discipline as the NDCG discount table — runtime
    * `log10` could flip a rounding between libms); observed shares are
    * exact integer divisions; the readout is the per-digit signed
    * deviation. First digit via decimal-string head of integer cents —
    * identical in any engine. One hash aggregate.
    */
  private def qBenford(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val expected = Seq(1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)
      .toDF("digit", "exp_ppm")
    val o = t(spark, dir, "orders")
      .withColumn("digit",
        substring(expr("cast(cast(floor(o_totalprice * 100 + 0.5) as bigint) as string)"), 1, 1)
          .cast("int"))
      .groupBy("digit").agg(count(lit(1)).as("o"))
    val n = o.select(sum("o").as("n"))
    o.join(broadcast(expected), "digit").crossJoin(broadcast(n))
      .withColumn("obs_ppm", expr("(1000000 * o) div n"))
      .select(col("digit").cast("long").as("digit"), col("o"), col("obs_ppm"),
        col("exp_ppm"), (col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
      .orderBy("digit")
  }

  /** Mutual information between event type and hour-of-day — the
    * information-theoretic association readout next to [[qChi2]], in the
    * repo's exact integer-log arithmetic: each cell contributes
    * `o · (L(o·T) − L(r·c))` micro-nats with the shared
    * [[graft.functions.ScaledLn]] formula (floor(ln·1e6 + 0.5), identical
    * IEEE ops both engines), long-summed — bit-exact at any scale. Cell
    * counts are one hash aggregate; marginals broadcast back.
    */
  private def qMutualInfo(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ScaledLn
    val o = events(spark, dir)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("o"))
    val r = o.groupBy("event_type").agg(sum("o").as("r"))
    val c = o.groupBy("hod").agg(sum("o").as("c"))
    val tt = o.select(sum("o").as("t"))
    o.join(broadcast(r), "event_type").join(broadcast(c), "hod")
      .crossJoin(broadcast(tt))
      .withColumn("cell_mi",
        col("o") * (ScaledLn.column(col("o") * col("t")) -
          ScaledLn.column(col("r") * col("c"))))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_cells"), sum("o").as("n_events"),
        sum("cell_mi").as("mi_contrib_micro"))
      .orderBy("event_type")
  }

  /** Pareto concentration ("how few documents hold 80% of the corpus") —
    * the Lorenz-curve point next to [[qSourceGini]]'s Gini, and like it
    * computed ENTIRELY from the per-(lang, value) count histogram: with
    * values cumulated in DESCENDING order, the crossing value v* is the
    * single row where the strictly-above mass is < 80% and the inclusive
    * mass ≥ 80%; the docs needed inside the tied block are one exact
    * ceiling division. `5·chars ≥ 4·S` keeps every comparison integer.
    * One corpus hash aggregate + a distinct-value window — no per-row
    * rank at any scale.
    */
  private def qPareto(spark: SparkSession, dir: String): DataFrame = {
    val hist = t(spark, dir, "documents")
      .groupBy("lang", "n_chars").agg(count(lit(1)).as("m"))
    val wv = Window.partitionBy("lang").orderBy(col("n_chars").desc)
    val tot = Window.partitionBy("lang")
    val cum = hist
      .withColumn("cumc", sum(col("m") * col("n_chars")).over(wv))
      .withColumn("cumn", sum("m").over(wv))
      .withColumn("s", sum(col("m") * col("n_chars")).over(tot))
      .withColumn("n", sum("m").over(tot))
      .withColumn("above", col("cumc") - col("m") * col("n_chars"))
    cum
      .filter(col("above") * 5 < col("s") * 4 && col("cumc") * 5 >= col("s") * 4)
      .withColumn("j",
        expr("(4 * s - 5 * above + 5 * n_chars - 1) div (5 * n_chars)"))
      .withColumn("k80", col("cumn") - col("m") + col("j"))
      .select(col("lang"), col("n"), col("s"), col("k80"),
        expr("(1000000 * k80) div n").as("k80_ppm"),
        expr("(1000000 * (above + j * n_chars)) div s").as("share_ppm"))
      .orderBy("lang")
  }

  /** Weekly cohort retention: users grouped by first-seen ISO week, the
    * classic wk+0..wk+3 active-user matrix. The distinct (user, week)
    * activity set is aggregated once; offsets are exact integer week
    * counts (both engines truncate weeks to Monday).
    */
  private def qCohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val first = ev.groupBy("user_id").agg(min("wk").as("cw"))
    val act = ev.distinct().join(first, "user_id")
      .withColumn("off", expr("datediff(cast(wk as date), cast(cw as date)) div 7"))
    act.groupBy(col("cw").cast("date").cast("string").as("cohort_week"))
      .agg(countDistinct(when(col("off") === 0, col("user_id"))).as("w0"),
        countDistinct(when(col("off") === 1, col("user_id"))).as("w1"),
        countDistinct(when(col("off") === 2, col("user_id"))).as("w2"),
        countDistinct(when(col("off") === 3, col("user_id"))).as("w3"))
      .orderBy("cohort_week")
  }

  /** Frequent-itemset pairs (market-basket) over order baskets with the
    * A-priori prune: only brands whose single-item basket support clears
    * `minSupport` enter the pairing at all, so the within-basket self-join
    * explodes over surviving items only — the classic guard that keeps
    * pairwise mining from blowing up on a 100 TB basket table. The
    * frequent-item set is a bounded dimension (≤ distinct brands) and
    * broadcast; the pair join is a within-basket equi-join on the basket
    * key (never a cross join); lift is integer-exact ppm so both engines
    * hash identically.
    */
  private def qItemsets(spark: SparkSession, dir: String): DataFrame = {
    // distinct (basket, brand): basket = order, item = part brand.
    // Materialized ONCE (localCheckpoint): the basket count, the item
    // supports, and BOTH sides of the within-basket pair self-join reuse
    // this frame — unmaterialized, each branch re-derived the whole
    // lineitem⋈part⋈distinct subtree (the before plan scanned lineitem
    // and part 12x EACH; guide §3.3: materialise reused intermediates to
    // truncate the plan). At 100 TB this is the difference between one
    // pass over the fact table and twelve.
    val bi = t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
      .distinct()
      .localCheckpoint(true)
    // RELATIVE support (0.5% of baskets): the threshold scales with the
    // data, so the same query is meaningful at sf0.001 and at 100 TB
    val nBaskets = bi.select(countDistinct("basket").as("n_baskets"))
    val itemSupp = bi.groupBy("item").agg(count(lit(1)).as("supp"))
    val frequent = itemSupp.crossJoin(broadcast(nBaskets)) // A-priori prune
      .filter(col("supp") * 200 >= col("n_baskets")).drop("n_baskets")
      .localCheckpoint(true) // ≤|brands| rows, reused by fbi (x2) and sa/sb
    val fbi = bi.join(broadcast(frequent.select("item")), "item")
    val pairs = fbi.as("a").join(fbi.as("b"), Seq("basket"))
      .filter(col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("pair_supp"))
      .crossJoin(broadcast(nBaskets))
      .filter(col("pair_supp") * 200 >= col("n_baskets")).drop("n_baskets")
    val sa = frequent.select(col("item").as("item_a"), col("supp").as("supp_a"))
    val sb = frequent.select(col("item").as("item_b"), col("supp").as("supp_b"))
    pairs.join(broadcast(sa), "item_a").join(broadcast(sb), "item_b")
      .crossJoin(broadcast(nBaskets))
      // lift = N*supp(ab)/(supp(a)*supp(b)); floor ppm = bit-exact readout
      .withColumn("lift_ppm",
        expr("(1000000 * n_baskets * pair_supp) div (supp_a * supp_b)"))
      .withColumn("conf_ppm", expr("(1000000 * pair_supp) div supp_a"))
      .select("item_a", "item_b", "pair_supp", "supp_a", "supp_b",
        "conf_ppm", "lift_ppm")
      .orderBy(col("pair_supp").desc, col("item_a"), col("item_b"))
      .limit(20)
  }

  /** First-order Markov transition matrix over each user's time-ordered
    * event stream: lag-1 pairs → transition counts → row-normalized
    * probabilities in integer ppm. One window pass (partitioned by user,
    * so state never exceeds a user's history) and one bounded aggregate
    * (|types|² rows) — the transition model of a 100 TB event log is a
    * 25-row readout.
    */
  private def qMarkov(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = events(spark, dir)
      .withColumn("prev", lag("event_type", 1).over(byUser))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("cur"))
      .agg(count(lit(1)).as("n"))
    val rowTot = trans.groupBy("prev").agg(sum("n").as("tot"))
    trans.join(broadcast(rowTot), "prev")
      .withColumn("p_ppm", expr("(1000000 * n) div tot"))
      .select("prev", "cur", "n", "tot", "p_ppm")
      .orderBy("prev", "cur")
  }

  /** Blocked fuzzy matching (entity-resolution candidate pairs): distinct
    * part names paired ONLY within a shared-token block (last word), then
    * verified with exact Levenshtein ≤ 3. The block key turns an O(n²)
    * all-pairs into an equi-join — the standard blocking discipline; a
    * production run would add a per-block size cap exactly like
    * [[graft.ops.Dedup]]'s `maxBucketSize` (the vocabulary here is
    * bounded, so the cap would never fire). Levenshtein is integer-exact
    * and identically defined in Spark and DuckDB.
    */
  private def qFuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val names = t(spark, dir, "part").select(col("p_name")).distinct()
      .withColumn("block", element_at(split(col("p_name"), " "), -1))
    names.as("a").join(names.as("b"), "block")
      .filter(col("a.p_name") < col("b.p_name"))
      .withColumn("dist", levenshtein(col("a.p_name"), col("b.p_name")))
      .filter(col("dist") <= 3)
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        col("dist").cast("long").as("dist"))
      .orderBy("name_a", "name_b")
  }

  /** Winsorization (percentile clipping) of document lengths per language
    * with EXPLICIT rank arithmetic: the p05/p95 bounds are the
    * ceil(q·n)-th smallest values — a definition both engines reproduce
    * bit-for-bit, sidestepping percentile interpolation conventions
    * entirely. Bounds are data values, so every clipped sum stays
    * integer-exact.
    *
    * Scale shape: the bound is located on the per-(lang, value) COUNT
    * HISTOGRAM — `lo = min v with cumcount(v) ≥ ceil(0.05·n)`, provably
    * the rank definition — so the only window runs over DISTINCT values
    * per language (value-bounded partitions), never a per-row rank of the
    * corpus. Exact at any scale; no approx fallback needed.
    */
  private def qWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("lang"), col("doc_id"), col("n_chars"))
    val hist = docs.groupBy("lang", "n_chars").agg(count(lit(1)).as("m"))
    val wv = Window.partitionBy("lang").orderBy("n_chars")
    val cum = hist
      .withColumn("cum", sum("m").over(wv))
      .withColumn("n", sum("m").over(Window.partitionBy("lang")))
    val bounds = cum
      .groupBy("lang")
      .agg(
        min(when(col("cum") >= expr("cast(ceil(0.05 * n) as bigint)"), col("n_chars")))
          .as("lo"),
        min(when(col("cum") >= expr("cast(ceil(0.95 * n) as bigint)"), col("n_chars")))
          .as("hi"))
    docs.join(broadcast(bounds), "lang")
      .withColumn("clipped", greatest(col("lo"), least(col("hi"), col("n_chars"))))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), min("lo").as("lo"), min("hi").as("hi"),
        sum("n_chars").as("sum_raw"), sum("clipped").as("sum_clipped"),
        sum(when(col("n_chars") =!= col("clipped"), 1L).otherwise(0L)).as("n_clipped"))
      .orderBy("lang")
  }

  /** CUSUM change-point detection over each event type's hourly count
    * series, in EXACT integer arithmetic: with S = total and n = #hours,
    * the scaled deviation `dev_k = n·cum_k − k·S` equals `n·(cum_k − k·μ)`
    * without ever forming the rational mean — so the argmax hour (the
    * detected change point) and the max |deviation| are bit-exact in any
    * engine. One bounded aggregate (hours × types) + one window pass per
    * type; a 100 TB event log still reduces to this tiny series first.
    */
  private def qCusum(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("y"))
    val w = Window.partitionBy("event_type").orderBy("h")
    val tot = Window.partitionBy("event_type")
    val dev = hourly
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("cum", sum("y").over(w))
      .withColumn("n", count(lit(1)).over(tot))
      .withColumn("s", sum("y").over(tot))
      .withColumn("dev", col("n") * col("cum") - col("k") * col("s"))
    dev.withColumn("mx", max(abs(col("dev"))).over(tot))
      .groupBy("event_type")
      .agg(max("n").as("n_hours"), max("s").as("n_events"),
        max("mx").as("max_abs_dev"),
        date_format(min(when(abs(col("dev")) === col("mx"), col("h"))),
          "yyyy-MM-dd HH:mm:ss").as("change_hour"))
      .orderBy("event_type")
  }

  /** Gini concentration of document length per language — the inequality
    * readout a curation pipeline uses to spot sources dominated by a few
    * giant documents. Closed form on the sorted series:
    * `G = (2·Σ i·x_i − (n+1)·S) / (n·S)` — every term an exact integer,
    * emitted as num/den plus a floor-ppm.
    *
    * Scale shape: Σ i·x_i is computed from the per-(lang, value) COUNT
    * HISTOGRAM, not per-row ranks — the m tied rows at value v occupy the
    * contiguous rank block (c_<v, c_<v + m], whose rank-sum is
    * `m·c_<v + m(m+1)/2` (tie order is irrelevant: tied values contribute
    * identically), so `Σ i·x_i = Σ_v v·(m·c_<v + m(m+1)/2)`. The only
    * window runs over DISTINCT values per language; the corpus itself is
    * touched by one hash aggregate. Exact at any scale.
    */
  private def qSourceGini(spark: SparkSession, dir: String): DataFrame = {
    val hist = t(spark, dir, "documents")
      .groupBy("lang", "n_chars").agg(count(lit(1)).as("m"))
    val wv = Window.partitionBy("lang").orderBy("n_chars")
    hist
      .withColumn("clt", sum("m").over(wv) - col("m")) // count strictly smaller
      .withColumn("ix_v",
        col("n_chars") * (col("m") * col("clt") + expr("(m * (m + 1)) div 2")))
      .groupBy("lang")
      .agg(sum("m").as("n"), sum(col("n_chars") * col("m")).as("s"),
        sum("ix_v").as("ix"))
      .withColumn("gini_num", lit(2) * col("ix") - (col("n") + 1) * col("s"))
      .withColumn("gini_den", col("n") * col("s"))
      .withColumn("gini_ppm", expr("(1000000 * gini_num) div gini_den"))
      .select("lang", "n", "s", "gini_num", "gini_den", "gini_ppm")
      .orderBy("lang")
  }

  /** Cohen's kappa agreement between two deterministic labeling
    * heuristics (char-length >= 500 vs alpha-word-count >= 80) — the
    * annotator-agreement readout a curation pipeline uses to decide
    * whether a cheap filter can stand in for an expensive one. The 2×2
    * contingency table is ONE hash aggregate per language; kappa's
    * `(n·po − pe) / (n² − pe)` is exact long arithmetic (n² fits a long
    * through ~3e9 docs per language; beyond that the same counts feed the
    * chi2-style double-first form), emitted ppm via `div` — Spark's `div`
    * and DuckDB's `//` both truncate toward zero, so the signed quotient
    * is bit-exact cross-engine.
    */
  private def qKappa(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .withColumn("a", (col("n_chars") >= 500).cast("long"))
      .withColumn("b",
        (size(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0))) >= 80)
          .cast("long"))
    d.groupBy("lang")
      .agg(sum(col("a") * col("b")).as("n11"),
        sum(col("a") * (lit(1L) - col("b"))).as("n10"),
        sum((lit(1L) - col("a")) * col("b")).as("n01"),
        sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"))
      .withColumn("n", expr("n11 + n10 + n01 + n00"))
      .withColumn("pe_num",
        expr("(n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)"))
      .withColumn("kappa_ppm",
        expr("(1000000 * (n * (n11 + n00) - pe_num)) div (n * n - pe_num)"))
      .select("lang", "n11", "n10", "n01", "n00", "n", "kappa_ppm")
      .orderBy("lang")
  }

  /** Lag-k autocorrelation (k = 1..3) of each event type's daily count
    * series — the seasonality/persistence screen next to [[qTrend]]'s
    * slope and [[qCusum]]'s change point. Exact integer form: with
    * S = Σy and n = #days, `n·y_t − S = n·(y_t − μ)` never forms the
    * rational mean, so numerator Σ(n·y_t−S)(n·y_{t+k}−S) over lag pairs
    * and denominator Σ(n·y_t−S)² are exact longs and the signed ppm
    * ratio is bit-exact cross-engine (both engines truncate). Magnitude
    * bound (the [[qKappa]] discipline): the readout's `1e6·num` needs
    * num ≲ 9.2e12, i.e. n·Σ(y−μ)(y'−μ) within long range — holds
    * comfortably for daily counts ≤ ~1e4 over ≤ ~1e3 days per type
    * (num ~ 1e3·1e3·1e8 = 1e14 worst-case is the wall; real
    * deviation products are far smaller), but a corpus with ~1e6+
    * daily counts needs the numerator rescaled before the ppm form.
    * Scale
    * shape: the 100 TB event log collapses to the (type × day) count
    * series in ONE map-side-combinable aggregate; the lag self-join runs
    * on that tiny series, keyed by integer day index so missing days
    * never misalign pairs.
    */
  private def qAcf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('day', ts)) div 86400000000").as("di"))
      .agg(count(lit(1)).as("y"))
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("y").as("s"))
    val dev = daily.join(broadcast(stats), "event_type")
      .withColumn("z", col("n") * col("y") - col("s"))
    val den = dev.groupBy("event_type")
      .agg(max("n").as("n_days"), sum(col("z") * col("z")).as("den"))
    val lags = Seq(1L, 2L, 3L).toDF("lag")
    // rename-disambiguated self-join (same lineage on both sides)
    val shifted = dev.select(col("event_type").as("et2"), col("di").as("di2"),
      col("z").as("z2"))
    val num = dev.crossJoin(broadcast(lags))
      .join(shifted,
        col("event_type") === col("et2") && col("di") + col("lag") === col("di2"))
      .groupBy("event_type", "lag")
      .agg(count(lit(1)).as("n_pairs"), sum(col("z") * col("z2")).as("num"))
    num.join(broadcast(den), "event_type")
      .withColumn("acf_ppm", expr("(1000000 * num) div den"))
      .select("event_type", "lag", "n_days", "n_pairs", "acf_ppm")
      .orderBy("event_type", "lag")
  }

  /** Mann–Whitney U between curation sources on document length — the
    * nonparametric "are these two sources drawn from the same length
    * distribution?" screen, read out as the exact rank-sum statistic and
    * its AUC form U/(n1·n2) (the probability a random src-A doc outranks
    * a random src-B doc). Everything stays integer by doubling: tied
    * values at combined-rank block (c, c+m] share average rank
    * (2c+m+1)/2, so 2·R1 = Σ m1·(2c+m+1) is an exact long and
    * 2·U1 = 2·R1 − n1(n1+1) ≥ 0.
    *
    * Scale shape: ranks come from the per-(source, value) COUNT
    * HISTOGRAM — the corpus is touched by ONE hash aggregate (the
    * histogram is lazily `localCheckpoint`ed, so the PairMatrix guard's
    * key job materializes it and both per-side joins reuse the pinned
    * result instead of re-scanning the corpus), the windows run over
    * distinct values per pair, and the pair expansion is
    * |pairs| × |distinct values|, never per-row. A fixed 5-source
    * probe set keeps the readout bounded; the pair frame comes from
    * [[graft.ops.PairMatrix]], whose maxPairs guard turns an unbounded
    * key set into a plan-time error instead of a quadratic job.
    */
  private def qMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val probe = (0 to 4).map(i => s"src$i")
    val hist = t(spark, dir, "documents")
      .filter(col("source").isin(probe: _*))
      .groupBy("source", "n_chars").agg(count(lit(1)).as("m"))
      .localCheckpoint(eager = false)
    val prs = graft.ops.PairMatrix.orderedPairs(hist, "source")
    val h1 = prs.join(hist, col("s1") === col("source"))
      .select(col("s1"), col("s2"), col("n_chars"), col("m").as("m1"), lit(0L).as("m2"))
    val h2 = prs.join(hist, col("s2") === col("source"))
      .select(col("s1"), col("s2"), col("n_chars"), lit(0L).as("m1"), col("m").as("m2"))
    val ph = h1.union(h2).groupBy("s1", "s2", "n_chars")
      .agg(sum("m1").as("m1"), sum("m2").as("m2"))
    val w = Window.partitionBy("s1", "s2").orderBy("n_chars")
    val ranked = ph
      .withColumn("m", col("m1") + col("m2"))
      .withColumn("c", sum("m").over(w) - col("m"))
      .withColumn("r2", lit(2L) * col("c") + col("m") + 1)
    ranked.groupBy("s1", "s2")
      .agg(sum("m1").as("n1"), sum("m2").as("n2"),
        sum(col("m1") * col("r2")).as("r1x2"))
      .withColumn("u1x2", expr("r1x2 - n1 * (n1 + 1)"))
      .withColumn("auc_ppm", expr("(1000000 * u1x2) div (2 * n1 * n2)"))
      .select("s1", "s2", "n1", "n2", "u1x2", "auc_ppm")
      .orderBy("s1", "s2")
  }

  /** Link prediction on the [[docLinkEdges]] host graph: common-neighbor
    * count and Adamic–Adar affinity for every NON-adjacent host pair —
    * the "which sources probably belong together" prior next to
    * [[qLabelProp]]'s communities. AA's 1/ln(deg z) weights use the one
    * repo scaled-log ([[graft.functions.ScaledLn]]): each witness
    * contributes `1e12 div s(deg z)` micro-units — exact long arithmetic
    * (witnesses only arise from deg ≥ 2, so s ≥ s(2) > 0).
    *
    * Scale shape: wedges are generated from the adjacency list by one
    * self-join per center node — fan-out bounded by degree (the same
    * shape [[qTriangles]] bounds by orientation; here both sides are
    * kept because the pair, not the count, is the output) — then
    * anti-joined against the edge set. No all-pairs product anywhere.
    */
  private def qLinkPredict(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ScaledLn
    val raw = docLinkEdges(spark, dir)
    val und = raw.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val adj = und.select(col("u").as("z"), col("v").as("x"))
      .union(und.select(col("v").as("z"), col("u").as("x")))
    val deg = adj.groupBy("z").agg(count(lit(1)).as("d"))
    val wedges = adj.select(col("z"), col("x").as("a"))
      .join(adj.select(col("z"), col("x").as("b")), "z")
      .filter(col("a") < col("b"))
      .join(deg, "z")
      .withColumn("sln", ScaledLn.column(col("d")))
    val scored = wedges.groupBy("a", "b")
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000000000 div sln")).as("aa_u"))
    scored
      .join(und, scored("a") === und("u") && scored("b") === und("v"), "left_anti")
      .orderBy(col("cn").desc, col("aa_u").desc, col("a"), col("b"))
      .limit(10)
  }

  /** Flesch reading ease per language — the readability screen of the
    * text-quality family ([[qQuality]], [[qGopherRepetition]]): words as
    * alpha runs, sentences as terminal-punctuation runs, syllables as
    * vowel-group runs (the classic heuristic), each clamped to >= 1.
    * `206.835 − 1.015·W/S − 84.6·Syl/W` is held in exact milli-units
    * with per-document integer divisions (the deterministic spec both
    * engines implement identically), then averaged per language by one
    * more integer division. Pure per-row codegen + one hash aggregate —
    * the 100 TB shape.
    */
  private def qFlesch(spark: SparkSession, dir: String): DataFrame = {
    val counted = t(spark, dir, "documents")
      .withColumn("w",
        greatest(size(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0))), lit(1))
          .cast("long"))
      .withColumn("sents",
        greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))), lit(1))
          .cast("long"))
      .withColumn("syl",
        greatest(size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0))), lit(1))
          .cast("long"))
      .withColumn("score_milli",
        expr("206835 - (1015 * w) div sents - (84600 * syl) div w"))
    counted.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("n_words"),
        sum("syl").as("n_syllables"),
        expr("sum(score_milli) div count(*)").as("avg_score_milli"),
        min("score_milli").as("min_score_milli"),
        max("score_milli").as("max_score_milli"))
      .orderBy("lang")
  }

  /** MMR diversified re-ranking ([[graft.ops.Mmr]]) of the brute-force
    * top-8 shortlist for three probe queries, k = 3 picks at λ = 0.7 —
    * the redundancy-suppressing second stage after ANN retrieval. The
    * oracle unrolls the identical greedy recurrence as chained argmax
    * CTEs (the [[qPagerank]] discipline), sharing the cosine kernel
    * with q_embed_topk, so the pick sequence must match row-for-row.
    */
  private def qMmrDiversify(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.toDoubleArray
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 3)
    val shortlist = Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", 8)
      .join(emb.select(col("vec_id").as("neighbor_id"),
        toDoubleArray(col("embedding")).as("__cv")), "neighbor_id")
    graft.ops.Mmr
      .diversify(shortlist, "query_id", "neighbor_id", "cosine", "__cv",
        k = 3, lambda = 0.7)
      .orderBy("query_id", "step")
  }

  /** RAKE keyword extraction ([[graft.ops.Rake]]): corpus-level top-10
    * phrases by summed degree/frequency word scores — unsupervised
    * topic profiling over the documents table. Micro-unit integer word
    * scores make the ranking bit-exact cross-engine.
    */
  private def qRakeKeywords(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Rake.keywords(
      spread(t(spark, dir, "documents")), "doc_id", "text", topK = 10)

  /** Range-partition boundary planning — the shard-boundary step of a
    * sorted/range-partitioned 100 TB write (what `repartitionByRange`
    * derives by sampling, made exact and auditable): 8 cut values at the
    * k/8 quantiles of doc length, then per-shard row/char totals for the
    * balance report. Entirely from the per-value COUNT HISTOGRAM — the
    * corpus is touched by one hash aggregate; no global per-row sort
    * anywhere (the [[qWinsorize]] bound pattern, generalized to a full
    * boundary ladder). A value's block lands wholly in the first shard
    * whose bound covers it, so boundaries are stable under re-sharding
    * of the input itself.
    */
  private def qRangeShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hist = t(spark, dir, "documents")
      .groupBy("n_chars").agg(count(lit(1)).as("m"))
    val wv = Window.orderBy("n_chars")
    val cum = hist
      .withColumn("cum", sum("m").over(wv))
      .crossJoin(broadcast(hist.agg(sum("m").as("n"))))
    val ks = (1 to 8).map(_.toLong).toDF("shard")
    val bounds = cum.crossJoin(broadcast(ks))
      .filter(col("cum") >= expr("(shard * n + 7) div 8"))
      .groupBy("shard").agg(min("n_chars").as("hi_bound"))
    val assigned = hist.crossJoin(broadcast(bounds))
      .filter(col("n_chars") <= col("hi_bound"))
      .groupBy("n_chars", "m").agg(min("shard").as("shard"))
    assigned.groupBy("shard")
      .agg(sum("m").as("n_rows"), min("n_chars").as("lo"),
        max("n_chars").as("hi"), sum(col("m") * col("n_chars")).as("sum_chars"))
      .join(broadcast(bounds), "shard")
      .select("shard", "hi_bound", "n_rows", "lo", "hi", "sum_chars")
      .orderBy("shard")
  }

  /** Time-travel read over the CDC event log — the state-as-of-T
    * snapshot a versioned table format serves (Delta/Iceberg "AS OF"),
    * expressed as plain relational algebra: clamp the log at the cutoff,
    * then the ONE [[graft.ops.CdcApply.compact]] hash aggregate + full
    * outer join that [[qCdcApply]] certifies for the latest state. The
    * cutoff is data-derived (min ts + 20 days) so the query stays a pure
    * function of the table; the readout is the same per-type count +
    * floor-scaled value sums. Scale shape identical to q_cdc_apply —
    * time travel costs nothing extra beyond the timestamp filter (which
    * pushes into the scan).
    */
  private def qTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val cutoff = ev.agg((min(col("ts")) + expr("INTERVAL 20 DAYS")).as("cut"))
    val asOf = ev.crossJoin(broadcast(cutoff)).filter(col("ts") <= col("cut"))
    val base = asOf.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min_by(struct(col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("__first"))
      .select(col("user_id"), col("__first.event_type").as("event_type"),
        col("__first.value").as("value"))
    val log = asOf.filter(col("event_type") =!= "signup")
      .withColumn("op",
        when(col("event_type") === "error", "delete").otherwise("upsert"))
    graft.ops.CdcApply.compact(
      base, log, Seq("user_id"), Seq("ts", "event_id"),
      "op", "delete", Seq("event_type", "value"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        sum(floor(col("value") * 1000000).cast("long")).as("sum_value_u"))
      .orderBy("event_type")
  }

  /** Last-touch attribution: each purchase credits the most recent
    * click or view by the same user strictly before it (7-day lookback)
    * — the event-analytics staple next to [[qFunnel]]. ONE per-user
    * window pass carries running last-click/last-view timestamps (the
    * [[qPatternNegation]] idiom — no self-join, no range join); the
    * credited channel is pure timestamp arithmetic (later of the two
    * running maxes; an exact tie credits the view — documented
    * tie-break). Revenue rides along as exact micro-units.
    */
  private def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ev = events(spark, dir)
      .withColumn("last_click",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .withColumn("last_view",
        max(when(col("event_type") === "view", col("ts"))).over(w))
    ev.filter(col("event_type") === "purchase")
      .withColumn("touch_ts", greatest(col("last_click"), col("last_view")))
      .filter(col("touch_ts").isNotNull &&
        col("ts") <= col("touch_ts") + expr("INTERVAL 7 DAYS"))
      .withColumn("channel",
        when(col("last_view").isNotNull &&
          (col("last_click").isNull || col("last_view") >= col("last_click")),
          "view").otherwise("click"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        sum(floor(col("value") * 1000000).cast("long")).as("sum_value_u"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("channel")
  }

  /** Exact Lloyd's k-means (k = 4, 2 update rounds) over milli-unit
    * quantized embeddings — clustering as a pure integer recurrence:
    * centroids start as bit-exact copies of the k lowest-id vectors (the
    * [[qSemanticDedup]] seeding), assignment is argmin of exact long
    * Σ(xq−c)² with centroid-id tie-break, and each update divides integer
    * sums by counts (an emptied cluster keeps its previous centroid —
    * part of the spec, mirrored by the oracle's LEFT JOIN + coalesce).
    * Deterministic at any partitioning, so the oracle unrolls the
    * identical rounds as CTE chains (the BPE/PageRank discipline).
    *
    * Scale shape per round: one n·k·d scoring pass with map-side-combined
    * partial sums + a (k × dim)-bounded centroid aggregate broadcast
    * back; the centroid frame is checkpointed each round so plan depth
    * stays constant. Readout: per-cluster size, exact inertia, min id.
    */
  private def qKmeansExact(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.toDoubleArray
    val k = 4
    // materialize the quantized vectors ONCE: `va` feeds every assign()
    // call (3x) and `v` every centroid update (2x) — without the cut each
    // consumer re-runs the parquet scan + binary decode + quantize
    // subtree (guide §3.3: materialize reused intermediates)
    val va = spread(t(spark, dir, "embeddings"))
      .select(col("vec_id"),
        transform(toDoubleArray(col("embedding")),
          x => floor(x * 1000 + lit(0.5)).cast("long")).as("qarr"))
      .localCheckpoint(true)
    val v = va.select(col("vec_id"), posexplode(col("qarr")))
      .toDF("vec_id", "pos", "xq")
    // scoring runs on the ARRAY form through the codegen SquaredL2 (n·k
    // rows), not the n·k·d exploded hash aggregate — identical exact longs
    def assign(cent: DataFrame): DataFrame = {
      val carr = cent.groupBy("cid").agg(
        transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          x => x.getField("c")).as("carr"))
      va.crossJoin(broadcast(carr))
        .withColumn("d2", graft.functions.SquaredL2(col("qarr"), col("carr")))
        .groupBy("vec_id")
        .agg(min_by(struct(col("cid"), col("d2")),
          struct(col("d2"), col("cid"))).as("__s"))
        .select(col("vec_id"), col("__s.cid").as("cid"), col("__s.d2").as("d2"))
    }
    var cent = v.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("pos"), col("xq").as("c"))
      .localCheckpoint(true)
    for (_ <- 1 to 2) {
      val upd = v.join(assign(cent).select("vec_id", "cid"), Seq("vec_id"))
        .groupBy("cid", "pos").agg(expr("sum(xq) div count(*)").as("cn"))
      cent = cent.join(upd, Seq("cid", "pos"), "left")
        .select(col("cid"), col("pos"), coalesce(col("cn"), col("c")).as("c"))
        .localCheckpoint(true)
    }
    assign(cent).groupBy("cid")
      .agg(count(lit(1)).as("n"), sum("d2").as("inertia"),
        min("vec_id").as("min_vec"))
      .orderBy("cid")
  }

  /** DBSCAN (ε² = 1.4e6 milli-units², minPts = 4 incl. self) over a
    * bounded embedding subset — density clustering as relational
    * algebra: the ε-neighbor graph (exact integer distances, the
    * [[qEmbedNeardup]] bounded all-pairs; LSH/IVF blocking is the
    * documented unbounded-scale path), core points by degree, clusters =
    * [[graft.ops.DupGroups.connectedComponents]] over core-core edges
    * (isolated cores self-cluster), borders attach to their min core
    * neighbor's cluster, the rest is noise (reported as cluster −1).
    * Every step is deterministic, so the oracle reproduces the full
    * partition with a recursive min-label CTE (the q_entity_clusters
    * discipline).
    */
  private def qDbscan(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.toDoubleArray
    val eps2 = 1400000L
    val minNb = 3 // core: >= 3 neighbors (minPts 4 incl. self)
    val q = t(spark, dir, "embeddings").filter(col("vec_id") < 1000)
      .select(col("vec_id"),
        transform(toDoubleArray(col("embedding")),
          x => floor(x * 1000 + lit(0.5)).cast("long")).as("q"))
    // exact ε-graph WITHOUT an all-pairs stage: pivot-ring equi-join +
    // codegen squared_l2 verify ([[graft.ops.EpsilonJoin]] — triangle-
    // inequality-complete, so the edge set is bit-identical to the
    // brute-force oracle's)
    val und = graft.ops.EpsilonJoin.selfJoin(spread(q), "vec_id", "q", eps2)
      .select(col("idA").as("ida"), col("idB").as("idb"))
      .localCheckpoint(true) // reused by degree, core edges, and borders
    // the ε-join above is the query's real work and runs at full session
    // width; everything after it operates on the ε-graph of the DECLARED
    // ≤1000-point subset (hundreds of edges) — running its degree counts,
    // CC rounds, and labeling joins box-wide spends more on task launch
    // than on data, so the tail is batch-sized like the streaming drains
    // ([[withShufflePartitionsCap]] rationale; the CC rounds additionally
    // self-size from their measured edge count)
    val (coreLab, borderLab) = withShufflePartitionsCap(spark, 8) {
      // symmetric orientation in ONE explode pass, not a self-union that
      // re-reads the checkpoint twice
      val adj = und.select(explode(array(
          struct(col("ida").as("node"), col("idb").as("nb")),
          struct(col("idb").as("node"), col("ida").as("nb")))).as("p"))
        .select(col("p.node").as("node"), col("p.nb").as("nb"))
      val core = adj.groupBy("node").agg(count(lit(1)).as("nnb"))
        .filter(col("nnb") >= minNb).select("node")
      val coreEdges = und
        .join(core.select(col("node").as("ida")), Seq("ida"))
        .join(core.select(col("node").as("idb")), Seq("idb"))
      val comp = graft.ops.DupGroups.connectedComponents(coreEdges, "ida", "idb")
      // tiny labeled frames are each read 2-3 times below (cluster rollup +
      // noise count) — checkpoint so the join chains run once
      val coreLab = core.join(comp, Seq("node"), "left")
        .select(col("node"), coalesce(col("component"), col("node")).as("cluster"))
        .localCheckpoint(true)
      val borderLab = adj
        .join(coreLab.select(col("node").as("nb"), col("cluster")), Seq("nb"))
        .join(core, Seq("node"), "left_anti")
        .groupBy("node").agg(min("cluster").as("cluster"))
        .localCheckpoint(true)
      (coreLab, borderLab)
    }
    val clusters = coreLab.groupBy("cluster").agg(count(lit(1)).as("n_core"))
      .join(borderLab.groupBy("cluster").agg(count(lit(1)).as("n_border")),
        Seq("cluster"), "left")
      .select(col("cluster"), col("n_core"),
        coalesce(col("n_border"), lit(0L)).as("n_border"))
      .withColumn("n_pts", col("n_core") + col("n_border"))
    val noise = q.agg(count(lit(1)).as("__t"))
      .crossJoin(broadcast(coreLab.agg(count(lit(1)).as("__c"))))
      .crossJoin(broadcast(borderLab.agg(count(lit(1)).as("__b"))))
      .select(lit(-1L).as("cluster"), lit(0L).as("n_core"),
        lit(0L).as("n_border"),
        (col("__t") - col("__c") - col("__b")).as("n_pts"))
    clusters.unionByName(noise).orderBy("cluster")
  }

  /** Simplified silhouette (centroid form) per label — the
    * class-separability readout next to [[qCentroidClassify]]'s
    * confusion matrix: for each vector, a = d² to its OWN class centroid,
    * b = min d² to any other class centroid, s = (b−a)/max(a,b) in
    * signed ppm (negative = the point sits closer to another class).
    * Same milli-unit quantization and integer-division centroids as the
    * classifier, so a, b, and every per-point ppm are exact longs.
    * One n·k·d scoring pass against the broadcast centroid table.
    */
  private def qSilhouette(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.toDoubleArray
    val vecs = spread(t(spark, dir, "embeddings"))
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(transform(toDoubleArray(col("embedding")),
          x => floor(x * 1000 + lit(0.5)).cast("long"))))
      .toDF("vec_id", "label", "pos", "xq")
    val cents = vecs.groupBy(col("label").as("clabel"), col("pos"))
      .agg(expr("sum(xq) div count(*)").as("c"))
    val d2 = vecs.join(broadcast(cents), Seq("pos"))
      .groupBy("vec_id", "label", "clabel")
      .agg(sum((col("xq") - col("c")) * (col("xq") - col("c"))).as("d2"))
    val ab = d2.groupBy("vec_id", "label")
      .agg(max(when(col("clabel") === col("label"), col("d2"))).as("a"),
        min(when(col("clabel") =!= col("label"), col("d2"))).as("b"))
      .withColumn("s_ppm",
        when(greatest(col("a"), col("b")) > 0,
          expr("(1000000 * (b - a)) div greatest(a, b)")).otherwise(0L))
    ab.groupBy("label")
      .agg(count(lit(1)).as("n"),
        expr("sum(s_ppm) div count(*)").as("mean_s_ppm"),
        sum(when(col("s_ppm") < 0, 1L).otherwise(0L)).as("n_neg"))
      .orderBy("label")
  }

  /** 2-D skyline / Pareto front per language: the documents no other
    * same-language document dominates on (length, alpha-word density) —
    * the multi-objective curation shortlist ("longest AND densest
    * frontier"). No all-pairs dominance join anywhere: within a length,
    * only density == the length's max survives; across lengths, a
    * length-group survives iff its max density strictly beats every
    * STRICTLY-longer group's (one lag over the per-length max frame —
    * the histogram decomposition again). Density is exact integer ppm;
    * equal (length, density) points tie and all survive, by definition
    * (no strict inequality).
    */
  private def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .withColumn("density_ppm",
        expr("(1000000 * cast(size(regexp_extract_all(text, '[A-Za-z]+', 0)) as bigint)) div n_chars"))
    val perLen = docs.groupBy("lang", "n_chars")
      .agg(max("density_ppm").as("vmax"))
    val wl = Window.partitionBy("lang").orderBy(col("n_chars").desc)
    val frontier = perLen
      .withColumn("prevmax",
        max("vmax").over(wl.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("prevmax").isNull || col("vmax") > col("prevmax"))
      .select(col("lang"), col("n_chars"), col("vmax"))
    docs.join(frontier, Seq("lang", "n_chars"))
      .filter(col("density_ppm") === col("vmax"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_skyline"), max("n_chars").as("max_len"),
        max("density_ppm").as("max_density_ppm"), min("doc_id").as("min_doc"))
      .orderBy("lang")
  }

  /** HITS hubs & authorities (Kleinberg) on the DIRECTED link graph —
    * the query-independent endorsement scores next to [[qPagerank]]'s
    * random-surfer mass: 2 mutual-reinforcement rounds in exact scaled
    * integers (each phase sums the counterpart score over in-/out-
    * neighbors, then renormalizes to max = 1e6 by integer division — the
    * PageRank floor-scaling discipline), so the oracle unrolls the
    * identical recurrence. Per phase: one edge join + hash aggregate +
    * a 1-row max broadcast; sink/source nodes read 0 via left-join
    * coalesce.
    */
  private def qHits(spark: SparkSession, dir: String): DataFrame = {
    val edges = docLinkEdges(spark, dir)
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    var auth = nodes.withColumn("a", lit(1000000L))
    var hub = nodes.withColumn("h", lit(1000000L))
    for (_ <- 1 to 2) {
      val aRaw = nodes.join(
        edges.join(hub.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node")).agg(sum("h").as("raw")),
        Seq("node"), "left")
        .select(col("node"), coalesce(col("raw"), lit(0L)).as("raw"))
      auth = aRaw.crossJoin(broadcast(aRaw.agg(max("raw").as("mx"))))
        .select(col("node"), expr("(1000000 * raw) div mx").as("a"))
        .localCheckpoint(true)
      val hRaw = nodes.join(
        edges.join(auth.withColumnRenamed("node", "dst"), Seq("dst"))
          .groupBy(col("src").as("node")).agg(sum("a").as("raw")),
        Seq("node"), "left")
        .select(col("node"), coalesce(col("raw"), lit(0L)).as("raw"))
      hub = hRaw.crossJoin(broadcast(hRaw.agg(max("raw").as("mx"))))
        .select(col("node"), expr("(1000000 * raw) div mx").as("h"))
        .localCheckpoint(true)
    }
    auth.join(hub, Seq("node"))
      .select(col("node"), col("a").as("auth_u"), col("h").as("hub_u"))
      .orderBy("node")
  }

  /** Two-sample Kolmogorov–Smirnov distance between the src0/src1
    * document-length distributions — the distribution-drift screen next
    * to [[qMannWhitney]]'s location test, from the same per-(source,
    * value) COUNT HISTOGRAM: at each distinct value, the scaled ECDF gap
    * `|cum1·n2 − cum2·n1|` is an exact long (D = max/( n1·n2)), so the
    * statistic, its ppm form, and the argmin value attaining it are all
    * bit-exact. One corpus hash aggregate; windows over distinct values
    * only.
    */
  private def qKsTest(spark: SparkSession, dir: String): DataFrame = {
    val hist = t(spark, dir, "documents")
      .filter(col("source").isin("src0", "src1"))
      .groupBy("n_chars")
      .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("m1"),
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("m2"))
    val w = Window.orderBy("n_chars")
    val cum = hist
      .withColumn("cum1", sum("m1").over(w))
      .withColumn("cum2", sum("m2").over(w))
      .crossJoin(broadcast(hist.agg(sum("m1").as("n1"), sum("m2").as("n2"))))
      .withColumn("gap", abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
    val mx = cum.agg(max("gap").as("d_scaled"))
    cum.crossJoin(broadcast(mx))
      .agg(max("n1").as("n1"), max("n2").as("n2"),
        max("d_scaled").as("d_scaled"),
        min(when(col("gap") === col("d_scaled"), col("n_chars"))).as("at_value"))
      .withColumn("d_ppm", expr("(1000000 * d_scaled) div (n1 * n2)"))
      .select("n1", "n2", "d_scaled", "d_ppm", "at_value")
  }

  /** Degree assortativity of the link graph — "do hubs link to hubs?"
    * (Newman's r over edge-endpoint degrees, both orientations). The
    * five moments are exact longs off one degree join; the readout
    * follows the [[qChi2]] double-first discipline with the one
    * correctly-rounded sqrt both engines share. The graph-health scalar
    * next to [[qTriangles]] / [[qLinkPredict]].
    */
  private def qAssortativity(spark: SparkSession, dir: String): DataFrame = {
    val raw = docLinkEdges(spark, dir)
    val und = raw.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val adj = und.select(col("u").as("a"), col("v").as("b"))
      .union(und.select(col("v").as("a"), col("u").as("b")))
    val deg = adj.groupBy("a").agg(count(lit(1)).as("d"))
    val pairs = adj
      .join(deg.select(col("a"), col("d").as("dx")), Seq("a"))
      .join(deg.select(col("a").as("b"), col("d").as("dy")), Seq("b"))
    pairs.agg(count(lit(1)).as("m2"), sum("dx").as("sx"), sum("dy").as("sy"),
      sum(col("dx") * col("dx")).as("sxx"),
      sum(col("dy") * col("dy")).as("syy"),
      sum(col("dx") * col("dy")).as("sxy"))
      .withColumn("num", expr("m2 * sxy - sx * sy"))
      .withColumn("d1", expr("m2 * sxx - sx * sx"))
      .withColumn("d2", expr("m2 * syy - sy * sy"))
      .withColumn("r_milli",
        when(col("d1") > 0 && col("d2") > 0,
          floor(col("num").cast("double") * lit(1000.0) /
            sqrt(col("d1").cast("double") * col("d2"))).cast("long")))
      .select("m2", "num", "d1", "d2", "r_milli")
  }

  /** Theil–Sen robust trend: the MEDIAN of all pairwise slopes of each
    * event type's daily count series — the outlier-immune complement to
    * [[qTrend]]'s least squares. Slopes quantize to exact integer
    * micro-units (`1e6·Δy div Δx`, truncation — the deterministic spec
    * both engines share), and the median is the explicit ceil(n/2)-th
    * rank on the per-type slope COUNT HISTOGRAM (the winsorize cut —
    * no per-row sort). Pair generation is the bounded (type × day)
    * frame self-joined — days², never the event log.
    */
  private def qTheilSen(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('day', ts)) div 86400000000").as("di"))
      .agg(count(lit(1)).as("y"))
      .localCheckpoint(true) // both sides of the pair join
    val a = daily.select(col("event_type"), col("di").as("d1"), col("y").as("y1"))
    val b = daily.select(col("event_type").as("et2"), col("di").as("d2"),
      col("y").as("y2"))
    val slopes = a.join(b, col("event_type") === col("et2") && col("d1") < col("d2"))
      .withColumn("s_u", expr("(1000000 * (y2 - y1)) div (d2 - d1)"))
    val hist = slopes.groupBy("event_type", "s_u").agg(count(lit(1)).as("m"))
    val wv = Window.partitionBy("event_type").orderBy("s_u")
    hist
      .withColumn("cum", sum("m").over(wv))
      .withColumn("n", sum("m").over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(max("n").as("n_pairs"),
        min(when(col("cum") >= expr("(n + 1) div 2"), col("s_u")))
          .as("median_slope_u"))
      .orderBy("event_type")
  }

  /** Sequential-pattern support (the 2-sequence core of PrefixSpan-style
    * mining): for every ordered type pair ⟨a, b⟩, how many users have
    * SOME a-event strictly before SOME b-event — `min_ts(a) < max_ts(b)`
    * per user, so the corpus collapses to one (user × type) aggregate of
    * first/last timestamps and the pattern join runs on that bounded
    * frame (|types|² combos per user, never the event log). The
    * sequence-mining complement to [[qClickPaths]]' contiguous paths.
    */
  private def qSeqPatterns(spark: SparkSession, dir: String): DataFrame = {
    val per = events(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
      .localCheckpoint(true) // read twice (both pattern sides)
    val nUsers = per.select("user_id").distinct().count()
    val a = per.select(col("user_id"), col("event_type").as("ta"), col("first_us"))
    val b = per.select(col("user_id"), col("event_type").as("tb"), col("last_us"))
    a.join(b, Seq("user_id"))
      .filter(col("ta") =!= col("tb") && col("first_us") < col("last_us"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("n_users"))
      .withColumn("supp_ppm", expr(s"(1000000 * n_users) div ${nUsers}L"))
      .orderBy(col("n_users").desc, col("ta"), col("tb"))
      .limit(15)
  }

  /** Conditional entropy of the next event type given the current one —
    * the sequence-predictability readout over [[qMarkov]]'s transition
    * matrix, in the repo's exact integer-log arithmetic: each transition
    * cell contributes `c·(L(r) − L(c))` micro-nats with the shared
    * [[graft.functions.ScaledLn]], long-summed per state and divided by
    * the state's row total. One window pass builds transitions; the
    * |types|²-bounded cell frame does the rest.
    */
  private def qEntropyRate(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ScaledLn
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val tr = events(spark, dir)
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("c"))
    val row = tr.groupBy("cur").agg(sum("c").as("r"))
    tr.join(broadcast(row), "cur")
      .withColumn("contrib",
        col("c") * (ScaledLn.column(col("r")) - ScaledLn.column(col("c"))))
      .groupBy("cur")
      .agg(max("r").as("n_transitions"), count(lit(1)).as("n_next_types"),
        expr("sum(contrib) div max(r)").as("h_cond_micro"))
      .orderBy("cur")
  }

  /** Pipeline freshness report: how far each event type lags the
    * corpus watermark (global max ts) — the staleness screen an ingest
    * pipeline alarms on. Lags quantize to whole minutes (bounded
    * distinct values), then p50/p95 are EXPLICIT ceil(q·n)-th ranks on
    * the per-(type, lag) COUNT HISTOGRAM — the [[qWinsorize]] bound
    * pattern; the corpus is touched by one hash aggregate and the
    * windows run over distinct lag values per type.
    */
  private def qFreshness(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val gmax = ev.agg(max(unix_micros(col("ts"))).as("gm"))
    val hist = ev.crossJoin(broadcast(gmax))
      .withColumn("lag_min", expr("(gm - unix_micros(ts)) div 60000000"))
      .groupBy("event_type", "lag_min").agg(count(lit(1)).as("m"))
    val wv = Window.partitionBy("event_type").orderBy("lag_min")
    val cum = hist
      .withColumn("cum", sum("m").over(wv))
      .withColumn("n", sum("m").over(Window.partitionBy("event_type")))
    cum.groupBy("event_type")
      .agg(max("n").as("n"),
        min(when(col("cum") >= expr("cast(ceil(0.5 * n) as bigint)"),
          col("lag_min"))).as("p50_lag_min"),
        min(when(col("cum") >= expr("cast(ceil(0.95 * n) as bigint)"),
          col("lag_min"))).as("p95_lag_min"),
        max("lag_min").as("max_lag_min"))
      .orderBy("event_type")
  }

  /** Pearson correlation matrix over the lineitem numerics — the
    * column-profiling readout Spark's builtin `corr()` cannot serve
    * deterministically (Welford accumulation is partition-order-
    * dependent): quantize each column once (dollars / basis points —
    * the binding column is price at ~1e5 dollars, whose Σy² grows
    * ~1e10 per row, so every moment stays an exact long through
    * ~1e9 rows; quantize price more coarsely past that), accumulate all
    * nine moments in ONE map-side-combinable aggregate, then form each
    * `r` double-first ([[qChi2]] discipline) with the one correctly-
    * rounded sqrt. Wide single-row readout, milli-scaled.
    */
  private def qCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
      .withColumn("x", floor(col("l_quantity") + lit(0.5)).cast("long"))
      .withColumn("y", floor(col("l_extendedprice") + lit(0.5)).cast("long"))
      .withColumn("z", floor(col("l_discount") * 10000 + lit(0.5)).cast("long"))
    val m = l.agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
      sum(col("z") * col("z")).as("szz"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("z")).as("sxz"), sum(col("y") * col("z")).as("syz"))
    def rMilli(sa: String, sb: String, sab: String, saa: String, sbb: String) =
      floor((col("n").cast("double") * col(sab) -
        col(sa).cast("double") * col(sb)) * lit(1000.0) /
        sqrt((col("n").cast("double") * col(saa) -
          col(sa).cast("double") * col(sa)) *
          (col("n").cast("double") * col(sbb) -
            col(sb).cast("double") * col(sb)))).cast("long")
    m.select(col("n"),
      rMilli("sx", "sy", "sxy", "sxx", "syy").as("r_qty_price_milli"),
      rMilli("sx", "sz", "sxz", "sxx", "szz").as("r_qty_disc_milli"),
      rMilli("sy", "sz", "syz", "syy", "szz").as("r_price_disc_milli"))
  }

  /** A/B experiment readout: user-level conversion (any purchase among
    * users with any click) compared across two deterministic cohorts
    * (user_id parity — the hash-split stand-in), with lift and the
    * two-proportion chi-square statistic. Counts reduce to ONE per-user
    * aggregate + one 4-cell rollup; the statistic follows the [[qChi2]]
    * double-first discipline (n·(x1·n2 − x2·n1)² / (n1·n2·x·(n−x)) in
    * milli-units — identical IEEE sequence both engines, no long wrap at
    * any cohort size). The experimentation-analytics staple.
    */
  private def qAbTest(spark: SparkSession, dir: String): DataFrame = {
    val users = events(spark, dir)
      .groupBy(col("user_id"), pmod(col("user_id"), lit(2)).as("cohort"))
      .agg(max(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicked"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchased"))
      .filter(col("clicked") === 1L)
    val cells = users.groupBy("cohort")
      .agg(count(lit(1)).as("n"), sum("purchased").as("x"))
    val wide = cells.agg(
      sum(when(col("cohort") === 0, col("n"))).as("n1"),
      sum(when(col("cohort") === 0, col("x"))).as("x1"),
      sum(when(col("cohort") === 1, col("n"))).as("n2"),
      sum(when(col("cohort") === 1, col("x"))).as("x2"))
    wide
      .withColumn("conv1_ppm", expr("(1000000 * x1) div n1"))
      .withColumn("conv2_ppm", expr("(1000000 * x2) div n2"))
      .withColumn("lift_ppm",
        when(col("x1") > 0,
          expr("(1000000 * (x2 * n1 - x1 * n2)) div (x1 * n2)")))
      .withColumn("chi2_milli",
        when(col("x1") + col("x2") > 0 &&
          col("n1") + col("n2") - col("x1") - col("x2") > 0,
          floor(((col("n1") + col("n2")).cast("double") *
            (col("x1").cast("double") * col("n2") - col("x2").cast("double") * col("n1")) *
            (col("x1").cast("double") * col("n2") - col("x2").cast("double") * col("n1"))) *
            lit(1000.0) /
            (col("n1").cast("double") * col("n2") * (col("x1") + col("x2")) *
              (col("n1") + col("n2") - col("x1") - col("x2")))).cast("long")))
  }

  /** Clickstream path mining: the most-traveled 3-step event-type
    * sequences (per-user, time-ordered) with traversal and distinct-user
    * volume — the funnel-DISCOVERY complement to [[qFunnel3]]'s fixed
    * funnel. Two lead()s in ONE per-user window pass build every
    * consecutive triple (no self-joins, no per-user collects); the path
    * space is |types|³-bounded so the count aggregate is tiny, and the
    * top-k is a TakeOrdered with a path-string tie-break.
    */
  private def qClickPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .withColumn("path",
        concat_ws(">", col("event_type"), col("e2"), col("e3")))
      .groupBy("path")
      .agg(count(lit(1)).as("n_traversals"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n_traversals").desc, col("path").asc)
      .limit(15)
  }

  /** Nearest-class-mean classifier evaluation over the labeled embedding
    * table — the cheap "are these labels linearly separable by centroid?"
    * probe run before training anything, read out as the full confusion
    * matrix. Exactness: vectors quantize per-position to milli-units
    * (floor(x·1e3 + ½) — one deterministic rounding per element), class
    * centroids are INTEGER divisions of integer sums (order-independent,
    * unlike a float mean), and distances are exact long Σ(xq−c)² — so
    * argmin and every matrix cell are bit-exact cross-engine.
    *
    * Scale shape: one posexplode + hash aggregate builds the (labels ×
    * dim) centroid table (bounded, broadcast back); scoring is the
    * standard n·k·d nearest-centroid work with the (vector, candidate)
    * partial sums map-side-combined; the argmin is a k-row min_by per
    * vector. (The float-path scale twin is [[graft.functions.NearestCentroids]],
    * which keeps the centroid model inside one codegen expression.)
    */
  private def qCentroidClassify(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.toDoubleArray
    val vecs = spread(t(spark, dir, "embeddings"))
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(transform(toDoubleArray(col("embedding")),
          x => floor(x * 1000 + lit(0.5)).cast("long"))))
      .toDF("vec_id", "label", "pos", "xq")
    val cents = vecs.groupBy(col("label").as("clabel"), col("pos"))
      .agg(expr("sum(xq) div count(*)").as("c"))
    val dists = vecs.join(broadcast(cents), Seq("pos"))
      .groupBy("vec_id", "label", "clabel")
      .agg(sum((col("xq") - col("c")) * (col("xq") - col("c"))).as("d2"))
    val preds = dists.groupBy("vec_id", "label")
      .agg(min_by(col("clabel"), struct(col("d2"), col("clabel"))).as("pred"))
    preds.groupBy("label", "pred").agg(count(lit(1)).as("n"))
      .orderBy("label", "pred")
  }

  /** Inter-arrival burstiness per event type: the squared coefficient of
    * variation of whole-second gaps between consecutive events — CV² = 1
    * is Poisson, above is bursty, below is regular (the dimensionless
    * load-model readout next to [[qPeakConcurrency]]). Gaps come from one
    * lead() window over (ts, event_id) — the [[qWindowLag]] shape, an
    * external sort at scale — then CV² reads off the exact long moments
    * (n, Σd, Σd²). The ppm readout follows the [[qChi2]] discipline:
    * `n·Q` and `S²` are formed DOUBLE-FIRST (1e6·n²·var would wrap a
    * long two orders of magnitude before the double envelope matters),
    * identical multiply-subtract-multiply-divide-floor sequence on both
    * engines — bit-exact at any scale.
    */
  private def qBurstiness(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    val gaps = events(spark, dir)
      .withColumn("next_us", lead(unix_micros(col("ts")), 1).over(w))
      .filter(col("next_us").isNotNull)
      .withColumn("d", expr("(next_us - unix_micros(ts)) div 1000000"))
    gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"), sum("d").as("s"),
        sum(col("d") * col("d")).as("q"))
      .withColumn("cv2_ppm",
        floor((col("n_gaps").cast("double") * col("q") -
          col("s").cast("double") * col("s")) * lit(1000000.0) /
          (col("s").cast("double") * col("s"))).cast("long"))
      .withColumn("mean_gap_s", expr("s div n_gaps"))
      .select("event_type", "n_gaps", "s", "mean_gap_s", "cv2_ppm")
      .orderBy("event_type")
  }

  /** Boolean conjunctive retrieval (AND of all query terms) — the
    * filter-mode sibling of [[qBm25]]'s ranked retrieval, sharing the same
    * fixed query set. Distinct (doc, term) postings join the broadcast
    * query-term dim; a doc matches when its distinct matched-term count
    * equals the query's term count. One corpus explode + hash aggregates;
    * the query side stays a bounded broadcast at any corpus size.
    */
  private def qBooleanRetrieval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val queries = Seq((1L, "sort merge join"), (2L, "hash table scan"),
      (3L, "stream window batch")).toDF("qid", "qtext")
    val qterms = queries
      .select(col("qid"), explode(split(col("qtext"), " ")).as("t")).distinct()
    val nq = qterms.groupBy("qid").agg(count(lit(1)).as("nt"))
    val postings = t(spark, dir, "documents")
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("t")).distinct()
    postings.join(broadcast(qterms), "t")
      .groupBy("qid", "doc_id").agg(count(lit(1)).as("m"))
      .join(broadcast(nq), "qid").filter(col("m") === col("nt"))
      .groupBy("qid")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_doc_ids"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("qid")
  }

  /** Phrase search over a POSITIONAL index: candidate positions for each
    * phrase word are cut down by a broadcast word-dim join FIRST, then the
    * two (already small) position sets meet in an equi-join on
    * (phrase, doc, position+1) — the scale shape of positional-postings
    * intersection; the corpus-sized position list is never self-joined
    * whole. The oracle checks adjacency directly on the token arrays.
    */
  private def qPhraseSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val phrases = Seq((1L, "sort", "merge"), (2L, "hash", "table"),
      (3L, "window", "batch")).toDF("pid", "w1", "w2")
    val pos = t(spark, dir, "documents")
      .select(col("doc_id"), posexplode(TF.tokens(col("text"))))
      .toDF("doc_id", "pos", "t")
    val w1s = pos.join(broadcast(phrases.select("pid", "w1")), col("t") === col("w1"))
      .select("pid", "doc_id", "pos")
    val w2s = pos.join(broadcast(phrases.select("pid", "w2")), col("t") === col("w2"))
      .select(col("pid"), col("doc_id"), (col("pos") - 1).as("pos"))
    w1s.join(w2s, Seq("pid", "doc_id", "pos"))
      .select("pid", "doc_id").distinct()
      .groupBy("pid")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_doc_ids"))
      .orderBy("pid")
  }

  /** Peak concurrency (max simultaneous intervals) per event type — the
    * +1/−1 sweep with a running sum, the operational twin of
    * [[qIntervalCoverage]]'s union length. Each event carries a service
    * interval [ts, ts + k seconds) (k from its JSON props; END EXCLUSIVE,
    * pinned by ordering end markers BEFORE start markers at equal
    * timestamps). The sweep is one window pass per type over 2 rows per
    * interval; the readout is the peak and the first instant it is
    * reached — all integer microseconds. Runs the BUCKETIZED
    * decomposition ([[graft.ops.IntervalCoverage.peakConcurrency]]:
    * clipped pieces preserve every instant's active count, so per-bucket
    * peaks max/min-combine exactly) — windows partition by
    * (type, bucket), never a global per-type sort; the oracle runs the
    * textbook single sweep, certifying the decomposition end-to-end.
    */
  private def qPeakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    // materialize the narrow (type, ts0, ts1) frame ONCE: the auto-bucket
    // p90 probe and the sweep are two full passes, and each would
    // re-execute the JSON k-extraction over the whole events table — the
    // parse dominates, not the sweep (guide §3.3: materialize a reused
    // intermediate; the parsed frame is 3 narrow columns, a fraction of
    // the raw props strings it replaces)
    val iv = events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("k").isNotNull && col("k") > 0)
      .select(col("event_type"), col("ts").as("ts0"),
        timestamp_micros(unix_micros(col("ts")) + col("k") * 1000000L).as("ts1"))
      .localCheckpoint(true)
    graft.ops.IntervalCoverage
      .peakConcurrencyAutoBucket(iv, Seq("event_type"), "ts0", "ts1")
      .orderBy("event_type")
  }

  /** CEP pattern with NEGATION — "purchase preceded by a click within 7
    * days with NO error in between", the match-recognize shape funnels
    * can't express. ONE window pass per user (running last-click /
    * last-error timestamps over the (ts, event_id) total order) answers
    * both the positive and the negative condition — no self-join, no
    * range join; the only shuffle is the per-user partition. The
    * error-free predicate is `last_error <= last_click` (an error BEFORE
    * the click doesn't break the pattern; one between does).
    */
  private def qPatternNegation(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ev = events(spark, dir)
      .withColumn("last_click",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .withColumn("last_error",
        max(when(col("event_type") === "error", col("ts"))).over(w))
    ev.filter(col("event_type") === "purchase" && col("last_click").isNotNull &&
        col("ts") <= col("last_click") + expr("INTERVAL 7 DAYS"))
      .withColumn("clean",
        col("last_error").isNull || col("last_error") <= col("last_click"))
      .groupBy(to_date(col("ts")).cast("string").as("day"))
      .agg(count(lit(1)).as("n_matched"),
        sum(when(col("clean"), 1L).otherwise(0L)).as("n_clean"),
        sum(when(col("clean"),
          expr("(unix_micros(ts) - unix_micros(last_click)) div 60000000"))
          .otherwise(0L)).as("sum_gap_min"))
      .orderBy("day")
  }

  /** Cross-source quantile normalization — the score-calibration step
    * that makes per-source quality scores comparable before mixing: each
    * source's value at within-source rank r maps to the GLOBAL value at
    * rank ceil(r·n_g/n_s), all in exact integer arithmetic
    * (`(r·n_g + n_s − 1) div n_s` is ceiling division for positive ints).
    * The mapping join is an equi-join on the target rank. The exact
    * global rank is a full sort at 100 TB — production would swap in
    * approx_percentile bin edges (envelope-graded in
    * [[qApproxPercentile]]); this query pins the exact semantics.
    */
  private def qQuantileNorm(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
    val bySource = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
    val ranked = docs
      .withColumn("r", row_number().over(bySource).cast("long"))
      .withColumn("ns", count(lit(1)).over(Window.partitionBy("source")))
    val global = docs
      .withColumn("j", row_number().over(
        Window.orderBy(col("n_chars"), col("doc_id"))).cast("long"))
      .select(col("j"), col("n_chars").as("gval"))
    val ng = global.select(count(lit(1)).as("ng"))
    ranked.crossJoin(broadcast(ng))
      .withColumn("j", expr("(r * ng + ns - 1) div ns"))
      .join(global, "j")
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_raw"),
        sum("gval").as("sum_norm"), min("gval").as("min_norm"),
        max("gval").as("max_norm"))
      .orderBy("source")
  }

  /** Entity-resolution capstone: [[qFuzzyMatch]]'s blocked candidate pairs
    * fed through [[graft.ops.DupGroups.connectedComponents]] (alternating
    * large-star/small-star, lineage-cut rounds) into entity clusters with
    * a deterministic canonical representative (min part key per name).
    * Names with no fuzzy neighbor self-cluster via the left-join
    * `coalesce`. The same discipline that resolves duplicate metadata
    * records at 100 TB: block, verify, cluster, pick a survivor — no
    * stage is all-pairs and the cluster step is the audited CC operator.
    */
  private def qEntityClusters(spark: SparkSession, dir: String): DataFrame = {
    val names = t(spark, dir, "part").groupBy("p_name")
      .agg(min("p_partkey").cast("long").as("nid"))
      .withColumn("block", element_at(split(col("p_name"), " "), -1))
    val pairs = names.as("a").join(names.as("b"), "block")
      .filter(col("a.p_name") < col("b.p_name") &&
        levenshtein(col("a.p_name"), col("b.p_name")) <= 3)
      .select(col("a.nid").as("u"), col("b.nid").as("v"))
    val comp = graft.ops.DupGroups.connectedComponents(pairs, "u", "v")
    val allc = names
      .join(comp.withColumnRenamed("node", "nid"), Seq("nid"), "left")
      .withColumn("component", coalesce(col("component"), col("nid")))
    val cl = allc.groupBy("component").agg(count(lit(1)).as("cluster_size"))
    cl.join(names.select(col("nid").as("component"), col("p_name").as("rep_name")),
        "component")
      .select(col("rep_name"), col("cluster_size"),
        col("component").cast("long").as("component"))
      .orderBy("rep_name")
  }

  /** Mergeable histogram quantiles — the percentile-monitoring analogue
    * of [[qHllSketchUnion]]: integer log2 buckets (floor(log2(cents)) =
    * bit length - 1, exact in any engine) are counted PER INGEST SHARD,
    * shard histograms merge by plain summation (never re-scanning rows),
    * and p50 is located by cumulative bucket mass. Graded exactly: the
    * oracle re-derives the bucket arithmetic AND the true median
    * (half-integer, x2 to an integer) — no envelope needed because every
    * step is integer-exact.
    */
  private def qValueHistogram(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .withColumn("cents", expr("cast(floor(value * 100 + 0.5) as bigint)"))
      .withColumn("bkt", (length(expr("bin(cents)")) - 1).cast("long"))
    val perShard = ev
      .groupBy(col("event_type"), pmod(col("user_id"), lit(8)).as("shard"), col("bkt"))
      .agg(count(lit(1)).as("n"))
    val merged = perShard.groupBy("event_type", "bkt").agg(sum("n").as("n"))
    val w = Window.partitionBy("event_type").orderBy("bkt")
    val p50b = merged
      .withColumn("cumn", sum("n").over(w))
      .withColumn("tot", sum("n").over(Window.partitionBy("event_type")))
      .filter(col("cumn") * 2 >= col("tot"))
      .groupBy("event_type").agg(min("bkt").as("p50_bucket"))
    val med = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        (expr("percentile(cents, 0.5d)") * 2).cast("long").as("med2"))
    med.join(broadcast(p50b), "event_type")
      .withColumn("median_in_bucket",
        col("med2") >= expr("shiftleft(cast(1 as bigint), cast(p50_bucket as int) + 1)") &&
          col("med2") < expr("shiftleft(cast(1 as bigint), cast(p50_bucket as int) + 2)"))
      .select("event_type", "n", "p50_bucket", "med2", "median_in_bucket")
      .orderBy("event_type")
  }

  /** The [[graft.ops.Dedup.minhashBucketAudit]] no-silent-caps surface as
    * an oracled query. Bucket keys are xxhash-seeded (not SQL-derivable),
    * so the oracle pins the auditable INVARIANTS instead: every document
    * lands in exactly one bucket per band (per-band sizes sum to the doc
    * count) and the drop flag agrees with the cap everywhere.
    */
  private def qLshBucketAudit(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.minhashBucketAudit(
        t(spark, dir, "documents"), "doc_id", "text", maxBucketSize = 50)
      .groupBy(col("band").cast("long").as("band"))
      .agg(sum("size").as("sum_size"),
        (sum(when(col("dropped") =!= (col("size") > 50), 1L).otherwise(0L)) === 0)
          .as("cap_ok"))
      .orderBy("band")

  /** Zero-extra-pass pipeline telemetry (`Dataset.observe`): the pass
    * itself reports its audit metrics through a CollectMetrics node —
    * counts/sums accumulate per task and reach the driver with the job's
    * completion events, so a 100 TB write audits itself without a second
    * scan. The query executes ONE action over the filtered projection and
    * returns the observed metrics as the result; the oracle computes the
    * same aggregates directly.
    */
  private def qObserve(spark: SparkSession, dir: String): DataFrame = {
    val obs = new org.apache.spark.sql.Observation()
    val df = t(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 25)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum("l_quantity").cast("long").as("sum_qty"),
        r(max("l_extendedprice"), 2).as("max_price"))
    df.count() // the one action; metrics ride on it
    val row = obs.get
    import spark.implicits._
    Seq((row("n_rows").asInstanceOf[Long],
      row("sum_qty").asInstanceOf[Long],
      row("max_price").asInstanceOf[Double]))
      .toDF("n_rows", "sum_qty", "max_price")
  }

  /** MULTIPLE distinct aggregates in one GROUP BY — the Expand-based
    * rewrite (one row replicated per distinct column set, then two-phase
    * aggregation); distinct state is partitioned by (group, value), so
    * a hot group's distinct sets still spread across reducers.
    */
  private def qMultiDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(date_format(col("o_orderdate"), "yyyy-MM").as("m")).as("n_months"),
        countDistinct(col("o_orderstatus")).as("n_status"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** The TYPED Dataset surface end-to-end ([[graft.ops.TypedAgg]]):
    * case-class rows (`as[Item]`), `groupByKey`, and a custom
    * `Aggregator[IN, BUF, OUT]` with map-side partials — the
    * quantity-weighted mean price per return flag in integer cents
    * (exact partial sums; ONE integer division per group, so the result
    * is partition-order independent and the oracle reproduces it with
    * the same arithmetic).
    */
  private def qTypedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.ops.TypedAgg
    t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("qty"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("priceCents"))
      .as[TypedAgg.Item]
      .groupByKey(_.flag)
      .agg(TypedAgg.WeightedPriceCents.toColumn.name("w_price_cents"))
      .toDF("l_returnflag", "w_price_cents")
      .orderBy("l_returnflag")
  }

  private def qDistinctAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n"),
        r(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("o_orderpriority")

  private def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val h1 = o.filter(col("o_orderdate") < lit("1998-01-01")).select("o_custkey").distinct()
    val h2 = o.filter(col("o_orderdate") >= lit("1998-01-01")).select("o_custkey").distinct()
    h1.intersect(h2).agg(count(lit(1)).as("n_both"))
      .crossJoin(broadcast(h1.except(h2).agg(count(lit(1)).as("n_only_early"))))
      .crossJoin(broadcast(h1.union(h2).distinct().agg(count(lit(1)).as("n_any"))))
  }

  private def qScalarFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderkey") <= 500)
      .select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("pr"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        length(col("o_orderstatus")).cast("long").as("ls"),
        r(sqrt(col("o_totalprice")), 4).as("sq"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("cc"))
      .orderBy("o_orderkey")

  /** Higher-order array functions (§2B scalar surface beyond strings/
    * dates): each user's history collected to an ORDERED array
    * (`sort_array` of (ts, event_id) structs — per-user state, the
    * sessionization boundedness contract), consecutive gaps via
    * `zip_with` over two `slice`s, folded with `aggregate` — the whole
    * chain is one codegen'd projection after one grouping, no second
    * shuffle, no UDF. Readout: users histogrammed by max-gap hours. The
    * oracle reproduces relationally (lag window), pinning the array
    * semantics against an independent formulation.
    */
  private def qArrayFuncs(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id")))).as("evs"))
      .withColumn("n", size(col("evs")))
      .filter(col("n") >= 2)
      .withColumn("gaps", expr(
        "zip_with(slice(evs, 1, n - 1), slice(evs, 2, n - 1)," +
          " (a, b) -> unix_micros(b.ts) - unix_micros(a.ts))"))
      .withColumn("max_gap_us", expr("aggregate(gaps, -1L, (acc, g) -> greatest(acc, g))"))
      .withColumn("sum_gap_us", expr("aggregate(gaps, 0L, (acc, g) -> acc + g)"))
      .groupBy(expr("max_gap_us div 3600000000").as("gap_h"))
      .agg(count(lit(1)).as("n_users"), sum("sum_gap_us").as("sum_gap_us"))
      .orderBy("gap_h")

  private def qRegexExtract(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"))
      .orderBy("k_bucket")

  /** FORWARD as-of join ([[AsOfJoin.forward]] — the backward twin's
    * reversed window): each click attaches the same user's next purchase
    * at-or-after it. Oracle: DuckDB ASOF with `<=`.
    */
  private def qAsofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click").select(col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    AsOfJoin.forward(clicks, purchases, "user_id", "pu", "ts", "pts", Seq("pts"))
      .agg(count(lit(1)).as("n_clicks"), count(col("pts")).as("n_matched"),
        r(avg((unix_micros(col("pts")) - unix_micros(col("ts"))) / lit(1e6)), 2)
          .as("avg_gap_s"))
  }

  /** Tolerance-bounded as-of join ([[AsOfJoin.backward]] with
    * `tolerance`, the pandas `merge_asof` contract): each click attaches
    * its user's most recent purchase only if it happened within the past
    * 6 hours — a too-old nearest match nulls, it is never skipped past.
    * The oracle reproduces this as DuckDB ASOF + a gap CASE over the
    * matched time.
    */
  private def qAsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click").select(col("user_id"), col("ts"))
    // one row per (user, ts): same tie hygiene as q_asof_join — carried
    // `value` must not depend on which tied row an engine happens to keep
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("pu"), col("ts").as("pts"))
      .agg(max("value").as("value"))
    AsOfJoin.backward(clicks, purchases, "user_id", "pu", "ts", "pts",
        Seq("pts", "value"), tolerance = Some(expr("INTERVAL 6 HOURS")))
      .agg(count(lit(1)).as("n_clicks"), count(col("pts")).as("n_matched"),
        r(sum(col("value")), 2).as("sum_value"),
        r(avg((unix_micros(col("ts")) - unix_micros(col("pts"))) / lit(1e6)), 2)
          .as("avg_gap_s"))
  }

  /** Batch range (interval) join through [[graft.ops.RangeJoin]]'s
    * bucketized equi-join — same semantics as the raw interval predicate
    * (which Spark would execute as a nested-loop join), same oracle as the
    * streaming variant; `PlanSpec` asserts the plan is a shuffled
    * equi-join, not a cartesian/BNLJ.
    */
  private def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    graft.ops.RangeJoin.intervalJoin(clicks, purchases, "cu", "pu", "cts", "pts",
        0L, 3600000000L)
      .groupBy(date_format(col("cts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("n_matches"), countDistinct(col("cu")).as("n_users"))
      .orderBy("hour")
  }

  /** Interval-overlap join ([[graft.ops.RangeJoin.overlapJoin]], the
    * range x range companion of [[qRangeJoin]]'s point-in-range shape):
    * 30-minute click and purchase activity windows of the same user that
    * intersect, counted per click-hour. Canonical-bucket emission — each
    * overlapping pair meets exactly once, no dedup (RangeJoinSpec pins
    * equivalence with the naive theta join).
    */
  private def qOverlapJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    def windowed(kind: String, key: String, s: String, e: String) =
      ev.filter(col("event_type") === kind)
        .select(col("user_id").as(key), col("ts").as(s),
          timestamp_micros(unix_micros(col("ts")) + 1800000000L).as(e))
    graft.ops.RangeJoin.overlapJoin(
        windowed("click", "cu", "cs", "ce"),
        windowed("purchase", "pu", "ps", "pe"),
        "cu", "pu", "cs", "ce", "ps", "pe", bucketUs = 1800000000L)
      .groupBy(date_format(col("cs"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("n_overlaps"), countDistinct(col("cu")).as("n_users"))
      .orderBy("hour")
  }

  /** [[qOverlapJoin]] through [[graft.ops.RangeJoin.overlapJoinAutoBucket]]:
    * `bucketUs` derived from the data (p90 interval length) instead of the
    * caller's guess. Join semantics are bucket-invariant, so the oracle is
    * the SAME theta-join aggregate — what this row certifies is that
    * auto-tuning changes only the plan's explode factor, never the result.
    */
  private def qOverlapAutoBucket(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    def windowed(kind: String, key: String, s: String, e: String) =
      ev.filter(col("event_type") === kind)
        .select(col("user_id").as(key), col("ts").as(s),
          timestamp_micros(unix_micros(col("ts")) + 1800000000L).as(e))
    graft.ops.RangeJoin.overlapJoinAutoBucket(
        windowed("click", "cu", "cs", "ce"),
        windowed("purchase", "pu", "ps", "pe"),
        "cu", "pu", "cs", "ce", "ps", "pe")
      .groupBy(date_format(col("cs"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("n_overlaps"), countDistinct(col("cu")).as("n_users"))
      .orderBy("hour")
  }

  /** Co-located big-big join via BUCKETING — the pre-shuffle answer for
    * repeated joins at 100 TB: both sides bucketed (and sorted) on the
    * join key at write time, so every subsequent join of the pair runs
    * WITHOUT a shuffle on either side (`BucketingSpec` asserts zero
    * ShuffleExchange in this exact shape). The bucketed write is the
    * one-time cost; table names are content-keyed like every fixture so
    * regenerated testdata rebuilds them. The oracle is the plain join
    * aggregate — bucketing changes the physical layout, never the result.
    */
  private def qBucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val key = tmpKey(dir)
    val (ot, lt) = (s"orders_bkt_$key", s"lineitem_bkt_$key")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    def build(name: String, table: String, bucketCol: String): Unit =
      if (!spark.catalog.tableExists(name)) {
        // the in-memory catalog forgets tables across JVMs while the
        // warehouse dir persists — clear the orphan dir or CTAS refuses
        // the non-empty location
        deleteRec(new java.io.File(s"$wh/$name"))
        t(spark, dir, table).write.bucketBy(16, bucketCol).sortBy(bucketCol)
          .mode("overwrite").saveAsTable(name)
      }
    build(ot, "orders", "o_orderkey")
    build(lt, "lineitem", "l_orderkey")
    spark.table(lt).join(spark.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), r(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** RUNTIME bloom-filter join pruning — Catalyst's InjectRuntimeFilter:
    * a selective filter on the build side (urgent high-value orders) is
    * turned into a bloom filter that prunes the probe side's scan BEFORE
    * the join shuffle. At 100 TB this is the difference between shuffling
    * the whole fact table and shuffling the ~1% that can match; at a real
    * cluster's dim sizes the build side exceeds the broadcast threshold,
    * so the query pins that regime (no-broadcast + zero app-side scan
    * floor) to exercise the exact plan shape (`PlanSpec` asserts the
    * `bloom_filter_might_contain` probe-side filter). The rewrite is
    * semantics-neutral — the oracle is the plain join — and the tuning
    * confs are scoped: set, the join EXECUTED eagerly, restored in
    * `finally`, the bounded aggregate returned as a local relation.
    */
  private def qRuntimeBloom(spark: SparkSession, dir: String): DataFrame = {
    val tuned = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "512MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val urgent = t(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000)
        .select("o_orderkey")
      val agg = t(spark, dir, "lineitem")
        .join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum("l_quantity").cast("long").as("sum_qty"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy("l_returnflag")
      val rows = agg.collect() // bounded: one row per return flag
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), agg.schema)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Partitioned fact + filtered dim for [[qDpp]]: the fact side is the
    * events table written hive-partitioned BY event_type (the layout a
    * 100 TB fact table actually has), the dim side a tiny parquet lookup.
    * Both parquet-backed so the optimizer sees prunable file scans.
    */
  private[graft] def dppInput(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val base = oncePerDir(s"/tmp/graft_dpp/${tmpKey(dir)}", "dim/_SUCCESS") {
      val b = s"/tmp/graft_dpp/${tmpKey(dir)}"
      events(spark, dir)
        .withColumn("value_u", floor(col("value") * 1000000).cast("long"))
        .select("event_id", "user_id", "value_u", "event_type")
        .write.mode("overwrite").partitionBy("event_type").parquet(s"$b/fact")
      Seq(("click", 1L), ("purchase", 2L), ("view", 3L), ("signup", 4L),
        ("error", 5L)).toDF("event_type", "wgt")
        .write.mode("overwrite").parquet(s"$b/dim") // dim last = sentinel
    }
    (spark.read.parquet(s"$base/fact"), spark.read.parquet(s"$base/dim"))
  }

  /** Dynamic partition pruning (SURVEY.md §4 optimizer surface): joining
    * a hive-partitioned fact table on its PARTITION column against a
    * selectively-filtered dim makes Catalyst inject a runtime
    * `dynamicpruning` subquery into the fact scan — only the partitions
    * whose keys survive the dim filter are ever listed or read, the
    * partition-level sibling of [[qRuntimeBloom]]'s row-level filter and
    * THE mechanism that turns a 100 TB fact scan into a 2-partition
    * read. On by default; `PlanSpec` asserts the pruning subquery is in
    * the scan. The oracle reproduces the surviving-partition aggregate.
    */
  private def qDpp(spark: SparkSession, dir: String): DataFrame = {
    val (fact, dim) = dppInput(spark, dir)
    fact.join(dim.filter(col("wgt") <= 2), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value_u").as("sum_value_u"))
      .orderBy("event_type")
  }

  /** The scan for [[qMetaCount]] — caller must have routed parquet to
    * DSv2 and enabled `spark.sql.parquet.aggregatePushdown`. */
  private[graft] def metaCountFrame(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .agg(count(lit(1)).as("n_rows"),
        min("l_orderkey").as("min_key"), max("l_orderkey").as("max_key"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"))

  /** Metadata-only aggregation (parquet aggregate pushdown): COUNT/MIN/
    * MAX with no filter are answered from parquet FOOTER statistics —
    * zero data pages decompressed, the ANALYZE-speed path for 100 TB
    * freshness checks. Needs the DSv2 parquet reader
    * (`useV1SourceList=""`) plus `parquet.aggregatePushdown`; both
    * scoped set→execute→restore (the [[qRuntimeBloom]] discipline).
    * `PlanSpec` asserts `PushedAggregation` lands in the scan.
    */
  private def qMetaCount(spark: SparkSession, dir: String): DataFrame = {
    val tuned = Map(
      "spark.sql.sources.useV1SourceList" -> "",
      "spark.sql.parquet.aggregatePushdown" -> "true")
    val prev = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val agg = metaCountFrame(spark, dir)
      val rows = agg.collect() // exactly one row
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), agg.schema)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Small-file compaction ([[graft.ops.Compaction]]) end-to-end: the
    * documents table fragmented into 64 tiny files (the accreted-sink
    * state), compacted shuffle-free (`coalesce` over target-sized input
    * bins — `CompactionSpec` asserts the no-Exchange plan and the exact
    * output file count), then aggregated from the COMPACTED copy. The
    * oracle runs the same aggregate on the source table: compaction
    * changes the file layout, never a row. Both /tmp stages are
    * content-keyed and one-time per testdata generation.
    */
  private def qCompaction(spark: SparkSession, dir: String): DataFrame = {
    val key = tmpKey(dir)
    val frag = s"/tmp/graft_compact/${key}_frag"
    oncePerDir(frag, "_SUCCESS") {
      t(spark, dir, "documents").repartition(64)
        .write.mode("overwrite").parquet(frag)
    }
    val out = s"/tmp/graft_compact/${key}_out"
    oncePerDir(out, "_SUCCESS") {
      graft.ops.Compaction.compact(spark, frag, out, targetBytes = 4L << 20)
    }
    spark.read.parquet(out)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("doc_id").as("sum_ids"),
        sum("n_chars").as("sum_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")
  }

  /** Z-order clustering ([[graft.ops.ZOrderLayout]]) end-to-end: events
    * re-laid-out on the Morton interleave of (user_id, hour), then scanned
    * with a user-range predicate — the two-dimensional data-skipping
    * layout (each file covers a compact (user, time) rectangle, so
    * parquet min/max stats prune on either column; `ZOrderSpec` pins the
    * per-file span bound). The oracle runs the same filter+aggregate on
    * the source table: clustering changes the file layout, never a row.
    */
  private def qZorderScan(spark: SparkSession, dir: String): DataFrame = {
    val out = s"/tmp/graft_zorder/${tmpKey(dir)}"
    oncePerDir(out, "_SUCCESS") {
      val ev = events(spark, dir)
        .withColumn("hr", expr("unix_micros(ts) div 3600000000"))
      graft.ops.ZOrderLayout.write(ev, "user_id", "hr", nFiles = 16, out)
    }
    spark.read.parquet(out)
      .filter(col("user_id") >= 10 && col("user_id") <= 20)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        r(min("value"), 2).as("min_v"),
        r(max("value"), 2).as("max_v"))
      .orderBy("event_type")
  }

  /** Golden-record survivorship (MDM merge finish): the same entity
    * arrives from three sources of differing trust and completeness; the
    * merged record takes EACH FIELD from the highest-priority source
    * where it is non-null — `max_by(field, priority-when-non-null)`, one
    * hash aggregate per entity, no joins, no per-field passes. The
    * three source variants are synthesized deterministically from
    * `documents` (crawl: text but no lang; api: lang + chars but no
    * text; archive: complete but lowest priority), so the oracle
    * rebuilds them and applies DuckDB's `arg_max` identically.
    */
  private def qGoldenRecord(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val crawl = d.select(col("doc_id"), lit(3L).as("prio"),
      col("text"), lit(null).cast("string").as("lang"),
      lit(null).cast("long").as("n_chars"))
    val api = d.select(col("doc_id"), lit(2L).as("prio"),
      lit(null).cast("string").as("text"), col("lang"),
      (col("n_chars") + 1).as("n_chars")) // api over-counts by one
    val archive = d.select(col("doc_id"), lit(1L).as("prio"),
      concat(lit("archived: "), col("text")).as("text"), col("lang"),
      col("n_chars"))
    def survive(f: String) =
      expr(s"max_by($f, if(isnotnull($f), prio, null))").as(f)
    crawl.unionByName(api).unionByName(archive)
      .groupBy("doc_id")
      .agg(survive("text"), survive("lang"), survive("n_chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        sum(when(col("text").startsWith("archived: "), 1L).otherwise(0L))
          .as("n_from_archive"))
      .orderBy("lang")
  }

  /** Declarative data-quality audit ([[graft.ops.Constraints]]) — the
    * publish gate: the orders table's contract (non-null key, price
    * range, unique order key, customer referential integrity, date
    * sanity) evaluated with all row-level checks folded into ONE
    * aggregate pass, uniqueness as one hash aggregate, and the reference
    * check as one anti-join. The oracle recomputes each violation count
    * directly.
    */
  private def qConstraints(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Constraints._
    graft.ops.Constraints.audit(t(spark, dir, "orders"), Seq(
      NotNull("o_custkey"),
      InRange("o_totalprice", 0.0, 300000.0),
      Unique(Seq("o_orderkey")),
      RefIntegrity("o_custkey", t(spark, dir, "customer"), "c_custkey"),
      Satisfies(col("o_orderdate") < lit("2002-01-01"), "order_date_sane")))
  }

  /** SCD TYPE-2 dimension maintenance ([[graft.ops.Scd2]]): the customer
    * order-profile dimension (order count + spend class) loaded from the
    * pre-1998 snapshot, then merged with the full-range snapshot taken
    * "2001-09-01" — changed customers get their v1 row closed and a v2
    * opened, unchanged pass through, first-order-after-1998 customers
    * insert. Summarized per (valid_from, is_current) with key/attr
    * checksums; the oracle re-derives the full case analysis in SQL.
    * Spend class is an integer bucket (count-based), so attr comparison
    * is exact cross-engine.
    */
  private def qScd2(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Scd2
    def snap(cut: Option[String]) = {
      val o = t(spark, dir, "orders")
      cut.fold(o)(c => o.filter(col("o_orderdate") < lit(c)))
        .groupBy(col("o_custkey").as("cust"))
        .agg(count(lit(1)).as("n_orders"),
          (count(lit(1)) >= 3).cast("int").as("heavy"))
    }
    val h0 = Scd2.snapshotAsHistory(snap(Some("1998-01-01")),
      "cust", Seq("n_orders", "heavy"), to_date(lit("1998-01-01")))
    val h1 = Scd2.merge(h0, snap(None),
      "cust", Seq("n_orders", "heavy"), to_date(lit("2001-09-01")))
    h1.groupBy(col("valid_from").cast("string").as("valid_from"), col("is_current"))
      .agg(count(lit(1)).as("n_rows"),
        sum("cust").as("sum_keys"),
        sum("n_orders").as("sum_orders"),
        sum("heavy").cast("long").as("n_heavy"))
      .orderBy("valid_from", "is_current")
  }

  /** Salted skew join (explicit salting via [[graft.ops.SkewJoin]]) — the
    * salt changes the physical key distribution, never the result, which
    * is exactly what the oracle checks with a plain join.
    */
  private def qSkewJoin(spark: SparkSession, dir: String): DataFrame =
    graft.ops.SkewJoin.saltedInner(
        t(spark, dir, "lineitem"), t(spark, dir, "orders").select("o_orderkey", "o_orderpriority"),
        "l_orderkey", "o_orderkey", saltFactor = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), r(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("o_orderpriority")

  private def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select("event_id", "user_id", "ts", "event_type")
    // o_orderdate is day-granular: a customer can place several orders the
    // same day, making raw as-of tie-breaking nondeterministic in ANY
    // engine. Pre-aggregate to one row per (custkey, date) so both sides
    // (and the DuckDB ASOF oracle) resolve ties identically.
    val orders = t(spark, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max("o_totalprice").as("o_totalprice"))
    AsOfJoin.backward(ev, orders, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_totalprice"))
      .groupBy("event_type")
      .agg(count(col("o_totalprice")).as("n_with_order"),
        r(avg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy("event_type")
  }

  /** Structured Streaming over the events data (file stream → tumbling
    * 1-hour windows → memory sink, AvailableNow so the batch drains
    * synchronously). Oracle: plain date_trunc aggregation.
    */
  private def qStreamingWindow(spark: SparkSession, dir: String): DataFrame = {
    val raw = eventsRaw(spark, dir) // resolves the ts physical encoding
    val stream = spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet") // file source needs a directory
      .parquet(dir)
      // same encoding-branched conversion as the batch path (events())
      .withColumn("ts", eventsTsCol(raw.schema("ts").dataType))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("n"))
    // complete mode: a single AvailableNow batch emits every window (append
    // mode would withhold all of them — the watermark only advances after
    // the final batch, with no later batch left to flush). Sink name
    // derived from the dir like qLogStream's: concurrent drains must not
    // collide on a duplicate active query name.
    val sinkName = "graft_stream_out_" + tmpKey(dir)
    // batch-sized state width ([[withShufflePartitionsCap]], the
    // q_log_stream rationale): one state store per shuffle partition for
    // a few-hundred-window aggregate; scan-side parallelism unaffected
    withShufflePartitionsCap(spark, 8) {
      val q = stream.writeStream.outputMode("complete")
        .format("memory").queryName(sinkName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(300000)) {
        q.stop() // a partial memory table would silently fail the oracle
        throw new IllegalStateException("[graft] q_streaming_window drain timed out after 300 s")
      }
    }
    spark.table(sinkName).orderBy("hour", "event_type")
  }

  /** One-time: events as 8 ts-range parquet chunks (timestamps already
    * converted to micros, so the stream side needs no nanos handling).
    * Chunks are written SEQUENTIALLY so file mtimes ascend with event time:
    * the file stream ingests oldest-first, i.e. in event-time order — rows
    * arriving behind the watermark would be dropped as late (correct
    * streaming semantics, but not what these queries measure).
    */
  /** Run `body` with the RocksDB state-store provider AND changelog
    * checkpointing enabled, restoring the session's prior values after.
    * Changelog checkpointing is the production RocksDB configuration —
    * each batch commits an incremental changelog instead of uploading a
    * full snapshot — and the faster one here too (interleaved A/B:
    * q_list_state median 6.9 → 5.4 s, transform/map state −10%, none
    * worse). One helper so all transformWithState queries and the bench
    * floor stay on identical settings.
    */
  /** Run `body` with `spark.sql.shuffle.partitions` capped at `cap`
    * (never raised), restoring the prior value after — the micro-batch
    * sizing discipline of [[graft.streaming.StreamingNearDedup.dedupBatch]]
    * and `drainAppendToParquet`'s `statePartitionCap`, factored out for
    * drains that manage their own sink. A micro-batch's frames are
    * trigger-sized, not box-sized: running their shuffles (and any state
    * stores keyed off the shuffle width) at the session's cluster-sized
    * width spends more on task launch and state-store open/commit than on
    * data (measured 6.86 → 5.86 s on the near-dedup drain at 32 → 8,
    * dev/DRAIN_PROFILE.md r13). Deployments with bigger triggers size the
    * cap to their own batch volume.
    */
  /** Concurrency (ADVICE r16): the conf is SESSION-global and drains may
    * overlap (sink names are dir-keyed for exactly that reason), so a raw
    * save/set/restore races — drain B can save A's capped value as its
    * "prev" and restore it after A restores the real one, leaving the
    * session permanently capped. Guarded by a per-session reference
    * count: the FIRST entrant saves the session value, every entrant may
    * only LOWER the effective value, and only the LAST exitor restores
    * the saved one. A non-integer session value (e.g. `auto` under some
    * resource managers) skips capping entirely instead of throwing.
    */
  private val shufflePartitionsCapGuard =
    new java.util.HashMap[SparkSession, (Int, String)]()

  private def withShufflePartitionsCap[A](spark: SparkSession, cap: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val entered = shufflePartitionsCapGuard.synchronized {
      val prev = spark.conf.get(key)
      prev.toIntOption match {
        case None => false // non-integer deployment value: run uncapped
        case Some(cur) =>
          val old = shufflePartitionsCapGuard.get(spark)
          if (old == null) shufflePartitionsCapGuard.put(spark, (1, prev))
          else shufflePartitionsCapGuard.put(spark, (old._1 + 1, old._2))
          if (cur > cap) spark.conf.set(key, cap.toString)
          true
      }
    }
    try body
    finally if (entered) shufflePartitionsCapGuard.synchronized {
      val (n, saved) = shufflePartitionsCapGuard.get(spark)
      if (n == 1) {
        shufflePartitionsCapGuard.remove(spark)
        spark.conf.set(key, saved)
      } else shufflePartitionsCapGuard.put(spark, (n - 1, saved))
    }
  }

  private def withRocksDbStateStore[A](spark: SparkSession)(body: => A): A = {
    val confs = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def streamChunksDir(spark: SparkSession, dir: String): String = {
    // _v2: chunk order pinned OUTSIDE spark (sequenced names + strictly
    // increasing forced mtimes, the nearDupStreamSrcDir discipline).
    // Back-to-back writes can produce ms-tied part-file mtimes whose
    // UUID-name tie-break would let FileStreamSource swap two chunks —
    // harmless to order-insensitive aggregations, fatal to watermark
    // late-drops and to the order-sensitive q_streaming_cdc fold.
    val key = tmpKey(dir) + "_v2"
    oncePerDir(s"/tmp/graft_stream_src/$key", "_OK") {
      val out = s"/tmp/graft_stream_src/$key"
      deleteRec(new java.io.File(out))
      val ev = events(spark, dir).select("event_id", "event_type", "user_id", "ts", "value")
        .withColumn("__us", expr("unix_micros(ts)"))
      val r0 = ev.agg(min("__us"), max("__us")).head()
      val (lo, hi) = (r0.getLong(0), r0.getLong(1))
      val step = math.max(1L, (hi - lo) / 8 + 1)
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val t0 = System.currentTimeMillis()
      for (i <- 0 until 8) {
        val stage = s"$out/.stage"
        ev.filter(col("__us") >= lo + i * step && col("__us") < lo + (i + 1) * step)
          .drop("__us").coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = new org.apache.hadoop.fs.Path(f"$out/chunk-$i%02d.parquet")
        fs.rename(new org.apache.hadoop.fs.Path(part.getPath), dst)
        fs.setTimes(dst, t0 + i * 60000L, -1)
      }
      deleteRec(new java.io.File(s"$out/.stage"))
      new java.io.File(s"$out/_OK").createNewFile()
    }
  }

  /** Shared append-mode AvailableNow drain to a parquet sink, used by
    * every production-shape streaming query. `statePartitionCap` bounds the
    * stateful operator's shuffle partitions (state stores per partition are
    * the cost; at real scale this is sized to executor count) via an
    * exception-safe conf override. Timeout stops the query so a
    * half-written sink is never read, then fails the harness.
    *
    * `exactlyOnce = true` routes each batch through
    * [[graft.streaming.IdempotentParquetSink]] (overwrite-by-batch-id), so
    * a drain killed after a sink write but before the checkpoint commit
    * replaces — not duplicates — that batch's output on restart. Plain
    * append stays the default where a query's sink is rebuilt fresh per
    * run and restart replay is out of scope.
    */
  private def drainAppendToParquet(
      stream: DataFrame,
      sinkDir: String,
      qname: String,
      statePartitionCap: Option[Int] = None,
      exactlyOnce: Boolean = false): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val spark = stream.sparkSession
    val ckpt = graft.Scratch.ephemeralCkptDir(s"graft_${qname}_ckpt").toString
    def run(): Boolean = {
      val q = stream.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          if (exactlyOnce) graft.streaming.IdempotentParquetSink.writeBatch(batch, batchId, sinkDir)
          else batch.write.mode("append").parquet(sinkDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(300000)) { q.stop(); false } else true
    }
    val finished = statePartitionCap match {
      case None => run()
      case Some(cap) => withShufflePartitionsCap(spark, cap)(run())
    }
    // the per-drain checkpoint is one-shot (next drain creates a fresh one):
    // delete it, or repeated bench/verify rounds accumulate offset logs and
    // state-store files in /tmp without bound
    if (finished) deleteRec(new java.io.File(ckpt))
    if (!finished)
      throw new IllegalStateException(s"[graft] $qname drain timed out after 300 s")
  }

  /** A drain that emitted zero rows never creates the sink directory —
    * that is the correct EMPTY result (e.g. every window withheld by the
    * watermark), not an error; `ddl` supplies the schema for that case.
    */
  private def readSinkOrEmpty(spark: SparkSession, sinkDir: String, ddl: String): DataFrame =
    if (!new java.io.File(sinkDir).exists())
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(ddl))
    else graft.streaming.IdempotentParquetSink.read(spark, sinkDir)

  /** The PRODUCTION streaming shape (complete+memory above is the oracle
    * harness): append mode + foreachBatch parquet sink. Events arrive as
    * several time-chunked files (micro-batches), the watermark advances
    * between batches, and each window row is emitted exactly once when the
    * watermark passes its end — no driver-side state, no ever-growing
    * complete-mode store. The trailing windows the watermark never passes
    * (the final hour) are correctly withheld; the oracle reproduces that
    * cutoff. The sink is exactly-once ACROSS RESTARTS via
    * [[graft.streaming.IdempotentParquetSink]] (overwrite-by-batch-id;
    * kill/replay spec in StreamingSessionSpec) — the round-3/4 plain-append
    * duplicate-on-restart gap is closed.
    */
  private def qStreamingSink(spark: SparkSession, dir: String): DataFrame = {
    val srcDir = streamChunksDir(spark, dir)
    val key = tmpKey(dir)
    val sinkDir = s"/tmp/graft_stream_sink/$key"
    deleteRec(new java.io.File(sinkDir)) // fresh sink per run (deterministic re-runs)
    val schema = spark.read.parquet(srcDir).schema
    // 2 data batches (was 4): several micro-batches are still exercised —
    // the watermark advances between batches and windows span them — and
    // the emitted set is watermark-final-determined, so the declared
    // result is batching-invariant (the q_streaming_hll argument)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "4")
      .parquet(srcDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("n"))
    // windowed aggregation is stateful: same state-partition cap as the
    // other stateful drains (one state store per partition)
    drainAppendToParquet(stream, sinkDir, "q_streaming_sink",
      statePartitionCap = Some(2), exactlyOnce = true)
    readSinkOrEmpty(spark, sinkDir, "hour STRING, event_type STRING, n LONG")
      .orderBy("hour", "event_type")
  }

  /** Streaming chunking: [[graft.ops.Chunking.chunkTokens]] is stateless
    * (pure per-row codegen explode), so it runs under `readStream`
    * UNCHANGED — the RAG-prep-at-ingest shape: the native log stream
    * (multi-file admission, 2 micro-batches) parses each line, rebuilds a
    * document text from the typed fields (integers + words only — a
    * float field would re-open the Java-vs-C `%.2f` rounding divergence
    * in chunk CONTENT), explodes it into overlapping token windows with
    * no state and no watermark, and lands in the exactly-once sink. The
    * oracle rebuilds every chunk from the events table with the same
    * covering rule as q_chunk_split.
    */
  private def qStreamingChunk(spark: SparkSession, dir: String): DataFrame = {
    val path = logDir(spark, dir, "plain_many")
    val key = tmpKey(dir)
    val sinkDir = s"/tmp/graft_stream_chunk_sink/$key"
    deleteRec(new java.io.File(sinkDir))
    val stream = spark.readStream.format("log")
      .option("pattern", "(\\d+) (\\w+) user=(\\d+) ([0-9.]+)")
      .option("fieldNames", "event_id, event_type, user_id, value")
      .option("dataTypes", "INT, VARCHAR, INT, DOUBLE")
      .option("extensions", "txt")
      .option("maxFilesPerTrigger", "8")
      .load(path)
      .select(format_string("evt %d type %s by user %d",
        col("event_id"), col("event_type"), col("user_id")).as("doc"))
    val chunks = Chunking.chunkTokens(stream, "doc", 4, 3)
      .select(col("chunk_idx"), col("chunk_text"))
    drainAppendToParquet(chunks, sinkDir, "q_streaming_chunk", exactlyOnce = true)
    readSinkOrEmpty(spark, sinkDir, "chunk_idx INT, chunk_text STRING")
      .groupBy(col("chunk_idx").cast("long").as("chunk_idx"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("chunk_text")).as("n_distinct"))
      .orderBy("chunk_idx")
  }

  /** Stream-stream INTERVAL join (the remaining big streaming shape):
    * clicks joined to same-user purchases within the following hour, both
    * sides watermarked, state bounded by the join's time range. Inner-join
    * matches emit as soon as both rows have arrived (no watermark
    * withholding), so with event-time-ordered ingestion the result equals
    * the batch interval join — which is exactly what the oracle runs.
    */
  private def qStreamingJoin(spark: SparkSession, dir: String): DataFrame = {
    val srcDir = streamChunksDir(spark, dir)
    val key = tmpKey(dir)
    val sinkDir = s"/tmp/graft_stream_join_sink/$key"
    deleteRec(new java.io.File(sinkDir))
    val schema = spark.read.parquet(srcDir).schema
    // 4 files/trigger -> 2 data batches: cross-batch matching is exercised
    // (click in batch 1, purchase in batch 2) without paying per-batch
    // state-store commit overhead 4 more times. ONE source, two filtered
    // branches (a stream-stream SELF-join): both sides share a single
    // admission stream, so the directory is listed and the offset log
    // written once per trigger instead of twice — at real scale, half the
    // driver-side listing of a two-source plan for identical rows.
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "4").parquet(srcDir)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
      .withWatermark("pts", "1 hour")
    val matches = clicks.join(purchases,
      col("cu") === col("pu") &&
        col("pts") >= col("cts") && col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
    drainAppendToParquet(matches, sinkDir, "q_streaming_join", statePartitionCap = Some(2))
    readSinkOrEmpty(spark, sinkDir,
      "cu BIGINT, cts TIMESTAMP, pu BIGINT, pts TIMESTAMP")
      .groupBy(date_format(col("cts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("n_matches"), countDistinct(col("cu")).as("n_users"))
      .orderBy("hour")
  }

  /** Streaming per-window approximate distinct count — the sketch+stream
    * composition a live dashboard runs at 100 TB/day: HLL state per
    * watermarked hourly window (mergeable partial aggregates, no exact
    * distinct's Expand blowup in the state store), emitted once when the
    * watermark passes the window. Graded the q_hll way: the emitted
    * estimate joins the batch-exact distinct per window and the query
    * outputs exact + an envelope flag — within 25% OR +/-2 absolute (HLL
    * is deterministic on fixed input, so the flag is stable; the +/-2
    * floor covers the small windows where the small-range estimator is
    * off by 1-2 and any relative bound would demand exactness). The
    * envelope is sized 5 SIGMA for the sketch's rsd (0.05, Spark's
    * default): the sf0.1 sweep's 3600 windows put ~31 buckets outside
    * the original 5% (=1 sigma) envelope — a statistically guaranteed
    * failure at scale (round-14 catch; max rel error measured 16.7%).
    * Tightening rsd instead of widening the envelope is the WRONG fix
    * here: rsd=0.01 means a 25x larger sketch per window in the state
    * store and benched this query 2.6 s -> 9.5 s. The withheld-trailing-
    * window rule is q_streaming_sink's. */
  private def qStreamingHll(spark: SparkSession, dir: String): DataFrame = {
    val srcDir = streamChunksDir(spark, dir)
    val sinkDir = s"/tmp/graft_stream_hll_sink/${tmpKey(dir)}"
    deleteRec(new java.io.File(sinkDir))
    val schema = spark.read.parquet(srcDir).schema
    // 2 data batches, not 4 (the q_streaming_join posture): the append-mode
    // emission set is {windows whose end the FINAL watermark passes} — a
    // pure function of the data, not of the batching — while cross-batch
    // watermark advancement and state carry-over stay exercised; each
    // dropped batch was a full state-store open/commit cycle
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "4")
      .parquet(srcDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.05).as("est"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("est"))
    drainAppendToParquet(stream, sinkDir, "q_streaming_hll", statePartitionCap = Some(2))
    val est = readSinkOrEmpty(spark, sinkDir, "hour STRING, event_type STRING, est LONG")
    val exact = events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    est.join(exact, Seq("hour", "event_type"))
      .select(col("hour"), col("event_type"), col("n_users"),
        (abs(col("est") - col("n_users")) * 4 <= col("n_users") ||
          abs(col("est") - col("n_users")) <= 2).as("within_envelope"))
      .orderBy("hour", "event_type")
  }

  /** Streaming heavy hitters: per-micro-batch Count–Min sketches folded
    * into one running sketch (same width/depth/seed). CMS merge is
    * counter ADDITION, so the fold over ANY batch partitioning equals the
    * one-shot batch sketch counter-for-counter — the readout asserts that
    * equality exactly per top-k key (`fold_exact`), alongside the
    * deterministic one-sided `cms_ok` from [[graft.ops.HeavyHitters]].
    * Driver state is two small sketch arrays; per-key state never exists
    * anywhere — the streaming shape that survives an unbounded key space.
    */
  private def qStreamingHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = streamChunksDir(spark, dir)
    val (eps, conf, seed) = (0.0001, 0.999, 42)
    var folded: org.apache.spark.util.sketch.CountMinSketch = null
    val ckpt = graft.Scratch.ephemeralCkptDir("graft_streamhh_ckpt").toFile
    val stream = spark.readStream
      .schema("event_id LONG, event_type STRING, user_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", 4)
      .parquet(srcDir)
    val q = stream.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // distributed per-batch sketch; sequential foreachBatch -> the
        // driver-side fold needs no synchronization
        val s = batch.filter(col("user_id").isNotNull)
          .stat.countMinSketch("user_id", eps, conf, seed)
        if (folded == null) folded = s else folded.mergeInPlace(s)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000)) {
        q.stop()
        throw new IllegalStateException("[graft] q_streaming_heavy_hitters drain timed out")
      }
    } finally deleteRec(ckpt)
    val ev = events(spark, dir).filter(col("user_id").isNotNull)
    val batchSketch = ev.stat.countMinSketch("user_id", eps, conf, seed)
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("user_id")).limit(10)
    import spark.implicits._
    exact.collect().toSeq.map { r =>
      val k = r.getLong(0)
      val n = r.getLong(1)
      val fe = if (folded == null) -1L else folded.estimateCount(k)
      (k, n, fe == batchSketch.estimateCount(k), fe >= n)
    }.toDF("user_id", "n", "fold_exact", "cms_ok")
      .orderBy(desc("n"), col("user_id"))
  }

  /** Stream-stream LEFT OUTER join — inner matching plus the
    * state-EVICTION semantics outer joins add: an unmatched click emits
    * its null-extended row only when the watermark proves no purchase can
    * ever arrive for its one-hour window (wm > cts + 1h), and clicks
    * whose window the final watermark never passes are withheld forever.
    * The oracle reproduces exactly that rule in MILLISECONDS (watermark
    * arithmetic is ms-precision): matched pairs all emit; null rows only
    * where `cts_ms + 1h < wm_final`, with the final GLOBAL watermark the
    * MIN across the two watermarked inputs (multipleWatermarkPolicy=min):
    * `wm_final = min(max_click_ms, max_purchase_ms) - 1h` — verified
    * empirically: using the all-events max over-emits null rows.
    */
  private def qStreamingLeftJoin(spark: SparkSession, dir: String): DataFrame = {
    val srcDir = streamChunksDir(spark, dir)
    val key = tmpKey(dir)
    val sinkDir = s"/tmp/graft_stream_ljoin_sink/$key"
    deleteRec(new java.io.File(sinkDir))
    val schema = spark.read.parquet(srcDir).schema
    // same 2-batch admission + single-source self-join + state-partition
    // cap rationale as q_streaming_join
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "4").parquet(srcDir)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
      .withWatermark("pts", "1 hour")
    val joined = clicks.join(purchases,
      col("cu") === col("pu") &&
        col("pts") >= col("cts") && col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
    drainAppendToParquet(joined, sinkDir, "q_streaming_left_join",
      statePartitionCap = Some(2))
    readSinkOrEmpty(spark, sinkDir, "cu BIGINT, cts TIMESTAMP, pu BIGINT, pts TIMESTAMP")
      .groupBy(date_format(col("cts"), "yyyy-MM-dd HH").as("hour"))
      .agg(sum(when(col("pts").isNotNull, 1L).otherwise(0L)).as("n_matched"),
        sum(when(col("pts").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("cu")).as("n_users"))
      .orderBy("hour")
  }

  /** Stream-stream FULL OUTER interval join — both unmatched sides
    * surface: clicks with no purchase in their forward hour emit
    * null-extended when the left state expires (`cts + window <
    * watermark`, the q_streaming_left_join rule), purchases with no
    * click in their trailing hour when the right state expires
    * (`pts < watermark` — the condition's click range is
    * [pts-1h, pts], all below the watermark exactly when pts is).
    * State on both sides is watermark-bounded; the readout buckets by
    * the hour of whichever side exists.
    */
  private def qStreamingFullJoin(spark: SparkSession, dir: String): DataFrame = {
    val srcDir = streamChunksDir(spark, dir)
    val sinkDir = s"/tmp/graft_stream_fjoin_sink/${tmpKey(dir)}"
    deleteRec(new java.io.File(sinkDir))
    val schema = spark.read.parquet(srcDir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "4").parquet(srcDir)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
      .withWatermark("pts", "1 hour")
    val joined = clicks.join(purchases,
      col("cu") === col("pu") &&
        col("pts") >= col("cts") && col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"),
      "full_outer")
    drainAppendToParquet(joined, sinkDir, "q_streaming_full_join",
      statePartitionCap = Some(2))
    readSinkOrEmpty(spark, sinkDir, "cu BIGINT, cts TIMESTAMP, pu BIGINT, pts TIMESTAMP")
      .groupBy(date_format(coalesce(col("cts"), col("pts")), "yyyy-MM-dd HH").as("hour"))
      .agg(
        sum(when(col("cts").isNotNull && col("pts").isNotNull, 1L).otherwise(0L))
          .as("n_matched"),
        sum(when(col("pts").isNull, 1L).otherwise(0L)).as("n_click_only"),
        sum(when(col("cts").isNull, 1L).otherwise(0L)).as("n_purchase_only"),
        countDistinct(coalesce(col("cu"), col("pu"))).as("n_users"))
      .orderBy("hour")
  }

  /** The CUSTOM stateful operator ([[graft.streaming.Sessionize]],
    * `flatMapGroupsWithState`) end-to-end: event-time sessions with a
    * 30-minute gap over the chunked event stream, emitted on close (by a
    * later event, or by event-time timeout when the watermark passes
    * end+gap). The oracle rebuilds sessions with the lag/cumsum islands
    * trick in MILLISECONDS (the operator works on `Timestamp.getTime`, and
    * Spark watermarks are ms-precision) and reproduces the emission rule: a
    * user's non-last sessions always close; the last closes only if
    * `end + gap < final_watermark` (strict — the exec's timeout check).
    */
  private def qSessionizeCustom(spark: SparkSession, dir: String): DataFrame = {
    val srcDir = streamChunksDir(spark, dir)
    val key = tmpKey(dir)
    val sinkDir = s"/tmp/graft_sessionize_sink/$key"
    deleteRec(new java.io.File(sinkDir))
    val schema = spark.read.parquet(srcDir).schema
    import spark.implicits._
    val ev = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "4") // 2 data batches: sessions span batches
      .parquet(srcDir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("userId"), col("ts"), col("event_type").as("eventType"))
      .as[graft.streaming.Sessionize.Event]
    val sessions = graft.streaming.Sessionize.sessionize(spark, ev, gapMillis = 30 * 60 * 1000L)
    // same state-partition cap rationale as q_streaming_join
    drainAppendToParquet(sessions.toDF(), sinkDir, "q_sessionize_custom",
      statePartitionCap = Some(2))
    readSinkOrEmpty(spark, sinkDir,
      "userId BIGINT, start TIMESTAMP, end TIMESTAMP, nEvents INT, closed BOOLEAN")
      .groupBy(col("userId").as("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("nEvents").cast("long")).as("n_events"),
        max(col("nEvents").cast("long")).as("max_session_events"))
      .orderBy("user_id")
  }

  /** STREAM-STATIC join — the remaining everyday streaming shape: the
    * event stream enriched against a static dimension (the per-user order
    * aggregate). The static side plans as a plain batch relation inside
    * every micro-batch — Catalyst broadcasts it like any dimension join; no
    * state store is involved (nothing to watermark on the static side).
    * Inner join + stateless aggregate-after-sink keeps emission
    * deterministic; the oracle is the identical batch join.
    */
  private def qStreamStaticJoin(spark: SparkSession, dir: String): DataFrame = {
    val srcDir = streamChunksDir(spark, dir)
    val key = tmpKey(dir)
    val sinkDir = s"/tmp/graft_stream_static_sink/$key"
    deleteRec(new java.io.File(sinkDir))
    val schema = spark.read.parquet(srcDir).schema
    val dim = t(spark, dir, "orders")
      .groupBy(col("o_custkey").as("user_id"))
      .agg(count(lit(1)).as("n_orders"))
    val enriched = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "4")
      .parquet(srcDir)
      .join(broadcast(dim), Seq("user_id")) // static side: batch relation, broadcast
      .select(col("event_type"), col("n_orders"))
    drainAppendToParquet(enriched, sinkDir, "q_stream_static_join")
    readSinkOrEmpty(spark, sinkDir, "event_type STRING, n_orders BIGINT")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_enriched"), sum("n_orders").as("sum_orders"))
      .orderBy("event_type")
  }

  /** One-time: the event chunks with INJECTED duplicates — every third
    * event repeated inside its own chunk (same-batch dup) and every fifth
    * event from the trailing hour of a chunk repeated in the NEXT chunk
    * (cross-batch dup, still inside the 3-hour dedup SLA so the watermark
    * can never late-drop it before the dedup state sees it).
    */
  private def dupStreamChunksDir(spark: SparkSession, dir: String): String = {
    val key = tmpKey(dir)
    oncePerDir(s"/tmp/graft_stream_dup_src/$key", "_OK") {
      val out = s"/tmp/graft_stream_dup_src/$key"
      deleteRec(new java.io.File(out))
      val ev = events(spark, dir).select("event_id", "event_type", "user_id", "ts", "value")
        .withColumn("__us", expr("unix_micros(ts)"))
      val r0 = ev.agg(min("__us"), max("__us")).head()
      val (lo, hi) = (r0.getLong(0), r0.getLong(1))
      val step = math.max(1L, (hi - lo) / 8 + 1)
      val hourUs = 3600L * 1000000L
      for (i <- 0 until 8) {
        val curLo = lo + i * step
        val cur = ev.filter(col("__us") >= curLo && col("__us") < curLo + step)
        val sameBatchDups = cur.filter(col("event_id") % 3 === 0)
        val crossBatchDups = ev.filter(
          col("__us") >= curLo - hourUs && col("__us") < curLo &&
            col("event_id") % 5 === 0)
        cur.unionByName(sameBatchDups).unionByName(crossBatchDups)
          .drop("__us").coalesce(1).write.mode("append").parquet(out)
      }
      new java.io.File(s"$out/_OK").createNewFile()
    }
  }

  /** Streaming DEDUPLICATION (`dropDuplicatesWithinWatermark`) — the
    * streaming face of the exact-dedup operator: duplicate events arriving
    * within the 3-hour watermark SLA (same batch or a later one) are
    * suppressed by keyed state that the watermark then expires — state is
    * bounded by the SLA, not the stream. Deduped rows append to a parquet
    * sink; the oracle is plain batch DISTINCT on event_id, and `n = n_ids`
    * in the output is the proof the stream-side dedup removed every
    * injected duplicate.
    */
  private def qStreamingDedup(spark: SparkSession, dir: String): DataFrame = {
    val srcDir = dupStreamChunksDir(spark, dir)
    val key = tmpKey(dir)
    val sinkDir = s"/tmp/graft_stream_dedup_sink/$key"
    deleteRec(new java.io.File(sinkDir))
    val schema = spark.read.parquet(srcDir).schema
    val deduped = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "4") // 2 data batches: dups cross batches
      .parquet(srcDir)
      .withWatermark("ts", "3 hours")
      .dropDuplicatesWithinWatermark("event_id")
    drainAppendToParquet(deduped, sinkDir, "q_streaming_dedup", statePartitionCap = Some(2))
    readSinkOrEmpty(spark, sinkDir,
      "event_id LONG, event_type STRING, user_id LONG, ts TIMESTAMP, value DOUBLE")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct("event_id").as("n_ids"))
      .orderBy("event_type")
  }

  /** One-time: the documents corpus as 4 ordered stream chunks — batches
    * 0-2 split the originals by doc_id % 3; batch 3 is the TRUNCATED
    * copies (first ceil(0.9 n) normalized tokens, id + 1e6) of every 10th
    * doc, so every copy arrives strictly after its original. Files are
    * written sequentially; the parquet file stream replays them oldest-
    * first, one per trigger.
    */
  private def nearDupStreamSrcDir(spark: SparkSession, dir: String): String = {
    val key = tmpKey(dir)
    oncePerDir(s"/tmp/graft_stream_neardup_src/$key", "_OK") {
      val out = s"/tmp/graft_stream_neardup_src/$key"
      deleteRec(new java.io.File(out))
      val docs = t(spark, dir, "documents").select("doc_id", "lang", "text")
      val copies = t(spark, dir, "documents").filter(col("doc_id") % 10 === 0)
        .withColumn("__toks", TF.tokens(col("text")))
        .withColumn("__n", size(col("__toks")))
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
          array_join(slice(col("__toks"), lit(1),
            expr("cast((__n * 9 + 9) div 10 as int)")), " ").as("text"))
      val batches = (0 until 3).map(i => docs.filter(col("doc_id") % 3 === i)) :+ copies
      // FileStreamSource orders by modification time, and part-file mtimes
      // from back-to-back writes can tie (coarse-granularity mounts) with
      // a UUID-name tie-break — so pin the batch order OUTSIDE spark:
      // stage each batch, move its one part file to a sequenced name, and
      // force strictly increasing mtimes
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val t0 = System.currentTimeMillis()
      batches.zipWithIndex.foreach { case (b, i) =>
        val stage = s"$out/.stage"
        b.coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = new org.apache.hadoop.fs.Path(s"$out/batch-$i.parquet")
        fs.rename(new org.apache.hadoop.fs.Path(part.getPath), dst)
        fs.setTimes(dst, t0 + i * 60000L, -1)
      }
      deleteRec(new java.io.File(s"$out/.stage"))
      new java.io.File(s"$out/_OK").createNewFile()
    }
  }

  /** Streaming near-dedup ([[graft.streaming.StreamingNearDedup]]): each
    * micro-batch near-deduplicates (shingle-Jaccard >= 0.8, banded
    * candidates + exact verify) against the KEPT rows of all prior
    * batches; survivors join the history through the exactly-once sink.
    * First occurrence wins across the stream; batch-internal near-dups
    * are kept by contract. The oracle replays the same 4-batch kept-set
    * recursion unrolled in SQL.
    */
  private def qStreamingNearDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = nearDupStreamSrcDir(spark, dir)
    val key = tmpKey(dir)
    val sinkDir = s"/tmp/graft_stream_neardup_sink/$key"
    deleteRec(new java.io.File(sinkDir))
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // one source file per batch, in order
      .parquet(srcDir)
    val ckpt = graft.Scratch.ephemeralCkptDir("graft_neardup_ckpt").toString
    val q = stream.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // micro-batch-sized shuffle width (measured 6.86 -> 5.86 s,
        // dev/DRAIN_PROFILE.md round-13): maxFilesPerTrigger=1 above
        // bounds every batch to ONE source file, so the width tracks the
        // batch, not the box — a deployment with bigger triggers sizes
        // this (opt-in parameter) to its own batch volume
        graft.streaming.StreamingNearDedup.dedupBatch(b, id, sinkDir, "doc_id", "text",
          shufflePartitions = Some(8))
      }
      .trigger(Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(300000)) q.stop()
    deleteRec(new java.io.File(ckpt))
    readSinkOrEmpty(spark, sinkDir, "doc_id LONG, lang STRING, text STRING")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_sum"))
      .orderBy("lang")
  }

  /** One-time: the odd-id documents as 2 stream chunks (doc_id % 4 ∈
    * {1, 3}). Batch ORDER is irrelevant here — scores under a fixed
    * model are per-doc — so plain sequential writes suffice.
    */
  private def classifyStreamSrcDir(spark: SparkSession, dir: String): String = {
    val key = tmpKey(dir)
    oncePerDir(s"/tmp/graft_stream_classify_src/$key", "_OK") {
      val out = s"/tmp/graft_stream_classify_src/$key"
      deleteRec(new java.io.File(out))
      val odd = t(spark, dir, "documents").filter(col("doc_id") % 2 === 1)
        .select("doc_id", "lang", "text")
      for (m <- Seq(1, 3))
        odd.filter(pmod(col("doc_id"), lit(4)) === m)
          .coalesce(1).write.mode("append").parquet(out)
      new java.io.File(s"$out/_OK").createNewFile()
    }
  }

  /** Streaming quality classification: the [[qQualityClassifier]] model
    * trained ONCE on the static even-id slice, then held fixed while the
    * odd-id corpus arrives as micro-batches — each batch scored in
    * `foreachBatch` (one explode + one unpinned weights join, the same
    * scan shape as batch) into the exactly-once sink. The oracle is the
    * batch classifier oracle VERBATIM: a fixed model scores per doc, so
    * batching must not change one value.
    */
  private def qStreamingClassify(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = spread(t(spark, dir, "documents"))
    val model = QualityClassifier.train(
      docs.filter(col("doc_id") % 2 === 0)
        .withColumn("__label", when(col("lang") === "en", 1).otherwise(0)),
      "text", "__label")
    val srcDir = classifyStreamSrcDir(spark, dir)
    val sinkDir = s"/tmp/graft_stream_classify_sink/${tmpKey(dir)}"
    deleteRec(new java.io.File(sinkDir))
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val ckpt = graft.Scratch.ephemeralCkptDir("graft_classify_ckpt").toString
    val q = stream.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // NO width cap here: measured 3.20 -> 3.35 s with one (r16 batch-4
        // drill) — the per-batch cost is the tokenize+score CPU, which
        // wants the full core count, not state/task overhead
        graft.streaming.IdempotentParquetSink.writeBatch(
          QualityClassifier.score(b, "doc_id", "text", model, carryCols = Seq("lang")),
          id, sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(300000)) q.stop()
    deleteRec(new java.io.File(ckpt))
    val agg = readSinkOrEmpty(spark, sinkDir,
      "doc_id LONG, lang STRING, n_tokens LONG, n_oov LONG, scaled_score LONG")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("scaled_score").as("sum_scaled_score"),
        sum(when(col("scaled_score") > 0, 1L).otherwise(0L)).as("n_pred_positive"),
        sum("n_oov").as("sum_oov"))
      .orderBy("lang")
    val out = agg.localCheckpoint(true)
    model.release()
    out
  }

  /** Sliding windows (1 h window, 30 min slide) over events — each event
    * lands in exactly two windows; the oracle materializes both window
    * starts per event explicitly.
    */
  private def qSlidingWindow(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("ws"),
        col("event_type"), col("n"))
      .orderBy("ws", "event_type")

  // ------------------------------------------------- LLM-pipeline queries

  private def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(TF.contentFingerprint(col("text"))).as("n_distinct"))
      .orderBy("lang")

  /** Three-corpus content Venn (multi-way [[qCorpusDiff]]): distinct
    * content fingerprints of three source slices reduced to a presence
    * BITMASK (one hash aggregate over (fp, source), one over fp — never
    * a pairwise join per corpus pair), counted per Venn region. The
    * 2^n-region readout is how corpus-overlap dashboards are actually
    * fed at scale; n corpora stay ONE pass regardless of n.
    */
  private def qVenn3(spark: SparkSession, dir: String): DataFrame = {
    val fp = t(spark, dir, "documents")
      .filter(col("source").isin("src0", "src1", "src2"))
      .select(col("source"), TF.contentFingerprint(col("text")).as("fp"))
      .distinct()
    fp.groupBy("fp")
      .agg(max(when(col("source") === "src0", 1L).otherwise(0L)).as("a"),
        max(when(col("source") === "src1", 1L).otherwise(0L)).as("b"),
        max(when(col("source") === "src2", 1L).otherwise(0L)).as("c"))
      .groupBy((col("a") * 4 + col("b") * 2 + col("c")).as("region"))
      .agg(count(lit(1)).as("n_contents"))
      .orderBy("region")
  }

  private def qDedupGroups(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(TF.contentFingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("sz"))
      .filter(col("sz") > 1)
      .agg(count(lit(1)).as("n_dup_groups"),
        coalesce(sum(col("sz")), lit(0L)).as("n_dup_docs"))

  private def qNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.tokenJaccardPairs(
        t(spark, dir, "documents").filter(col("doc_id") < 500),
        "doc_id", "text", "lang", 0.8)
      .agg(count(lit(1)).as("n_pairs"),
        r(avg("jaccard"), 3).as("avg_jaccard"))

  /** Containment dedup ([[Dedup.shingleContainmentPairsWithPostings]]):
    * |A∩B| / min(|A|,|B|) — the partial-copy detector. Planted evidence:
    * every 9th doc reappears truncated to its first 60% of tokens
    * (id + 1e6); the copy's shingles are a subset of the original's, so
    * containment hits 1.0 while the same pair's Jaccard ≈ 0.6 sits below
    * the 0.8 near-dup bar — `n_jaccard_misses` counts exactly the pairs
    * only containment catches.
    */
  private def qContainment(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val copies = docs.filter(col("doc_id") % 9 === 0)
      .withColumn("__toks", TF.tokens(col("text")))
      .withColumn("__n", size(col("__toks")))
      .select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(col("__toks"), lit(1),
          expr("cast((__n * 6 + 9) div 10 as int)")), " ").as("text"))
    val corpus = docs.select("doc_id", "text").unionByName(copies)
    val (pairs, posts) = Dedup.shingleContainmentPairsWithPostings(
      corpus, "doc_id", "text", shingleN = 3, threshold = 0.95)
    val out = pairs
      .agg(count(lit(1)).as("n_pairs"),
        r(avg("containment"), 3).as("avg_containment"),
        coalesce(sum(when(col("jaccard") < 0.8, 1L).otherwise(0L)), lit(0L))
          .as("n_jaccard_misses"))
      .localCheckpoint(true)
    posts.unpersist(blocking = false)
    out
  }

  /** MinHash+LSH near-dup pipeline, oracle-checked end to end: candidates
    * from banded LSH, verified with EXACT shingle-set Jaccard >= 0.8. The
    * oracle reproduces the exact pair set via a shingle inverted-index join
    * — a hash match proves the LSH stage had full recall on the true pairs
    * (the probabilistic guarantee at these parameters: a J=0.8 pair misses
    * all 16 bands with p ~ 2e-4).
    */
  private def qMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val (cand, sigs) = Dedup.minhashCandidatePairsWithSignatures(
      docs, "doc_id", "text", estimateJaccard = false)
    // materialize the 1-row aggregate eagerly so the signature cache is
    // released per run instead of accumulating across bench iterations
    val out = Dedup.verifyJaccard(cand.select("idA", "idB"), docs, "doc_id", "text")
      .filter(col("jaccard") >= 0.8)
      .agg(count(lit(1)).as("n_neardup_pairs"), r(avg("jaccard"), 3).as("avg_j"))
      .localCheckpoint(true)
    sigs.unpersist(blocking = false)
    out
  }

  /** Exact shingle-Jaccard>=0.8 ground-truth pairs, computed ONCE per
    * (session, dir) and shared by q_simhash and q_dup_clusters — they were
    * the #1/#3 bench entries and each recomputed the identical inverted
    * index. The truth set is materialized (`localCheckpoint`, eager) so
    * the postings cache releases immediately and reuse costs a block read,
    * not a recompute; the result is tiny (one row per true near-dup pair).
    * Keyed weakly by session so a stopped session's blocks don't pin the
    * cache entry.
    */
  private val truthCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]())

  /** The one per-(session, dir) memoization scheme behind [[truthCache]]
    * and [[bm25TfCache]]. Weak keying alone cannot reclaim entries (the
    * cached DataFrames strongly reference their session through
    * QueryExecution — the self-reference the WeakHashMap javadoc warns
    * about), so stopped sessions are purged explicitly on every access.
    */
  private def cachedPerDir(
      cache: java.util.Map[SparkSession, scala.collection.mutable.Map[String, DataFrame]],
      spark: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    val perSession = cache.synchronized {
      val it = cache.keySet().iterator()
      while (it.hasNext) {
        val s = it.next()
        if (s != null && s.sparkContext.isStopped) it.remove()
      }
      var m = cache.get(spark)
      if (m == null) {
        m = scala.collection.mutable.Map.empty[String, DataFrame]
        cache.put(spark, m)
      }
      m
    }
    perSession.synchronized { perSession.getOrElseUpdate(dir, build) }
  }

  private def shingleTruthPairs(spark: SparkSession, dir: String): DataFrame =
    cachedPerDir(truthCache, spark, dir) {
      val docs = t(spark, dir, "documents")
      val (truth, posts) =
        Dedup.shingleJaccardPairsWithPostings(docs, "doc_id", "text", 3, 0.8)
      val out = truth.localCheckpoint(true)
      posts.unpersist(blocking = false)
      out
    }

  /** BM25 tf postings (the inverted-index core, [[graft.ops.Bm25
    * .tfPostings]]) built ONCE per (session, dir) and served to every
    * retrieval query (q_bm25, q_ndcg, q_retrieval_recall, q_hybrid_rrf —
    * each previously re-tokenized the identical corpus). Persisted and
    * deliberately NOT released per query: the index outliving the query
    * batch IS the retrieval-engine feature (build once, query many); the
    * cache is session-scoped so `spark.stop()` reclaims the blocks.
    */
  private val bm25TfCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]())

  private def bm25Tf(spark: SparkSession, dir: String): DataFrame =
    cachedPerDir(bm25TfCache, spark, dir) {
      graft.ops.Bm25.tfPostings(
          spread(t(spark, dir, "documents")), "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** SimHash blocking graded against the exact near-dup set. The oracle
    * reproduces the EXACT shingle-Jaccard>=0.8 pair set (count + avg J);
    * the recall boolean is the in-query invariant: 128-bit simhash banding
    * (8 x 16-bit chunks — multi-index hashing, recall GUARANTEED up to
    * hamming 7 by pigeonhole) + hamming<=16 must recover >= 95% of the
    * true pairs (measured 25/25 = 1.0 at sf0.01; DedupSpec pins the recall
    * gate at spec level too). The hamming cutoff matches the operator's
    * 128-bit default: a J=0.8 pair's expected hamming roughly doubles
    * going 64->128 bits (same per-bit flip rate over twice the bits), so
    * the old 64-bit cutoff of 8 would kill true candidates. The exact side
    * is [[Dedup.shingleJaccardPairs]] — the same inverted-index
    * computation the oracle SQL performs — computed once per (session,
    * dir) and shared with q_dup_clusters via [[shingleTruthPairs]].
    */
  private def qSimhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val truth = shingleTruthPairs(spark, dir)
    // banded simhash candidates via the capped operator (8 x 16-bit bands,
    // hamming <= 16 — the SimHash128 defaults; degenerate buckets bounded)
    val simCand = Dedup.simhashCandidatePairs(docs, "doc_id", "text")
      .select(col("idA"), col("idB"), lit(1).as("__hit"))
    truth.join(simCand, Seq("idA", "idB"), "left")
      .agg(count(lit(1)).as("n_true_pairs"), r(avg("jaccard"), 3).as("avg_j"),
        // coalesce(..., true): with ZERO truth pairs the ratio is NULL/0 =
        // NULL, but recall over an empty set is vacuously satisfied — and
        // the oracle hardcodes `true`
        coalesce(sum(coalesce(col("__hit"), lit(0))).cast("double") /
          count(lit(1)).cast("double") >= 0.95, lit(true)).as("simhash_recall_ok"))
  }

  /** Duplicate GROUPS, not just pairs: exact shingle-Jaccard>=0.8 pairs →
    * connected components ([[DupGroups.connectedComponents]], alternating
    * large-star/small-star) → per-group size/canonical aggregate. The
    * oracle recomputes the same components with a recursive min-label CTE
    * — `sum_canonical` pins the exact per-node assignment (every node must
    * land on its component's true minimum id), not just the group count.
    */
  private def qDupClusters(spark: SparkSession, dir: String): DataFrame = {
    val truth = shingleTruthPairs(spark, dir)
    val comp = DupGroups.connectedComponents(truth, "idA", "idB")
    comp.groupBy("component").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_groups"),
        sum("sz").as("n_dup_docs"),
        max("sz").as("max_group_size"),
        sum("component").as("sum_canonical"))
  }

  /** Dup-cluster size histogram — the dedup-rate readout a corpus report
    * leads with: how many groups of each size, and the quadratic "pair
    * weight" (sz²) that tells you which few mega-clusters dominate the
    * dedup work. Same components as [[qDupClusters]], one more aggregate.
    */
  private def qDupHistogram(spark: SparkSession, dir: String): DataFrame = {
    val truth = shingleTruthPairs(spark, dir)
    val comp = DupGroups.connectedComponents(truth, "idA", "idB")
    comp.groupBy("component").agg(count(lit(1)).as("sz"))
      .groupBy("sz")
      .agg(count(lit(1)).as("n_groups"),
        sum(col("sz") * col("sz")).as("sq_doc_weight"))
      .select(col("sz").as("group_size"), col("n_groups"), col("sq_doc_weight"))
      .orderBy("group_size")
  }

  /** Deterministic stratified sampling + split assignment
    * ([[graft.ops.Sampling]]): membership is a pure function of
    * (doc_id, seed) — retry-stable and engine-portable, which is the whole
    * point vs rand()-based sample(). The oracle reproduces membership
    * BIT-FOR-BIT from the same portable hash formula; `id_sum` pins the
    * exact selected row set, not just counts.
    */
  private def qSampleHash(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
        Map("en" -> 0.5), defaultRate = 0.25, seed = 7)
      .withColumn("split", Sampling.assignSplit(col("doc_id"), 13,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
      .orderBy("lang", "split")
  }

  /** Length-weighted Bernoulli sampling ([[Sampling.weightedSample]]):
    * keep probability proportional to `n_chars` (p = w / 4·max) — the
    * importance-sampling counterpart of the flat rate sampler, pure
    * integer predicate, shuffle-free. The max weight is one scalar
    * aggregate; the readout pins the kept SET per language.
    */
  private def qWeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val maxW = docs.agg(max("n_chars")).head.getLong(0)
    Sampling.weightedSample(docs, col("doc_id"), col("n_chars"),
        num = 1L, den = 4L * maxW, seed = 31)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("w_sum"),
        sum("doc_id").as("id_sum"))
      .orderBy("lang")
  }

  /** Leakage-free grouped split ([[Sampling.groupedSplit]]): the split
    * key is the near-dup COMPONENT (shared [[shingleTruthPairs]] graph →
    * [[DupGroups.connectedComponents]]), so near-copies can never
    * straddle train/val/test. `n_groups` (distinct split_group per
    * split) pins the group→split assignment itself: a straddling group
    * would raise the global sum above the true group count, so the
    * oracle row catches leakage, not just totals; `id_sum` pins exact
    * row membership.
    */
  private def qGroupSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val truth = shingleTruthPairs(spark, dir)
    val comp = DupGroups.connectedComponents(truth, "idA", "idB")
    Sampling.groupedSplit(docs, "doc_id", comp, seed = 29,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split")
      .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"),
        count_distinct(col("split_group")).as("n_groups"))
      .orderBy("split")
  }

  /** Domain mixing ([[Sampling.proportionalSample]]): DoReMi-style
    * deterministic subsampling toward target source shares (60/30/10
    * across three sources, target size 60; everything else dropped —
    * the mixture is exhaustive). Keep rates derive from one group-count
    * aggregate; membership is the portable Lehmer bucket, so the oracle
    * reproduces the selected row set bit-for-bit, not just counts.
    */
  private def qDomainMix(spark: SparkSession, dir: String): DataFrame =
    Sampling.proportionalSample(t(spark, dir, "documents"), col("doc_id"), "source",
        Map("src1" -> 0.6, "src2" -> 0.3, "src3" -> 0.1), totalTarget = 60L, seed = 21)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_sum"))
      .orderBy("source")

  /** Heavy hitters ([[graft.ops.HeavyHitters]]): exact top-10 hottest users
    * by event count (oracle side, deterministic tiebreak) with each row's
    * Count–Min estimate graded against its guaranteed envelope
    * `exact <= est <= exact + eps*N` — the q_hll pattern applied to the
    * frequency sketch.
    */
  private def qHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    graft.ops.HeavyHitters.topKWithCmsCheck(
      events(spark, dir).select(col("user_id")), "user_id", 10)

  /** [[qHeavyHitters]] over the documents table (`source` key) — the sketch
    * path exercised on BOTH fixture families, so the Count–Min surface is
    * never hostage to the events table's timestamp encoding.
    */
  private def qHeavyHittersDocs(spark: SparkSession, dir: String): DataFrame =
    graft.ops.HeavyHitters.topKWithCmsCheck(
      t(spark, dir, "documents").select(col("source")), "source", 10)

  /** URL parsing (`parse_url` — host/query components) over synthesized
    * per-doc URLs, grouped by host: the C4-style provenance-grouping shape
    * (dedup/rate decisions per registrable host). The oracle rebuilds the
    * same URLs with printf and parses with regexp_extract.
    */
  private def qUrlExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(format_string("https://site-%d.example.org/%s/doc-%d?ref=%d",
        pmod(col("doc_id"), lit(20)), col("lang"), col("doc_id"),
        pmod(col("doc_id"), lit(7))).as("url"))
      .select(expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'QUERY')").as("query"))
      .groupBy("host")
      .agg(count(lit(1)).as("n"), countDistinct(col("query")).as("n_refs"))
      .orderBy("host")

  /** URL canonicalization ([[graft.functions.CanonicalizeUrl]]): noisy
    * URL variants synthesized per doc — case noise, default port on every
    * 3rd, unique utm_source on all, param order flipped on odd ids,
    * fragment on all — then canonicalized and deduplicated. The oracle
    * never string-transforms: it rebuilds each expected canonical URL
    * from first principles off the same integers, so every rule is
    * byte-checked end to end.
    */
  private def qUrlCanonical(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val params = when(col("doc_id") % 2 === 0,
      format_string("p=%d&q=%d&utm_source=u%d",
        pmod(col("doc_id"), lit(5)), pmod(col("doc_id"), lit(4)), col("doc_id")))
      .otherwise(format_string("utm_source=u%d&q=%d&p=%d",
        col("doc_id"), pmod(col("doc_id"), lit(4)), pmod(col("doc_id"), lit(5))))
    val url = format_string("HTTPS://Site-%d.Example.ORG%s/%s/doc-%d?%s#sec-%d",
      pmod(col("doc_id"), lit(20)),
      when(col("doc_id") % 3 === 0, lit(":443")).otherwise(lit("")),
      col("lang"), pmod(col("doc_id"), lit(100)), params, col("doc_id"))
    docs.select(col("lang"),
        graft.functions.CanonicalizeUrl(url).as("curl"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("curl")).as("n_canonical"),
        min("curl").as("min_curl"), max("curl").as("max_curl"))
      .orderBy("lang")
  }

  /** Quality-aware canonical selection ([[Dedup.keepBest]]): per duplicate
    * group (content fingerprint), keep the HIGHEST-quality copy, min-id on
    * ties — ordered on the RAW quality sum (exact 0.5 steps) so the
    * tiebreak is bit-identical to the oracle's window recomputation.
    */
  private def qDedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Dedup.keepBest(docs, "doc_id",
        TF.contentFingerprint(col("text")), TF.qualityScoreRaw(col("text")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_sum"))
      .orderBy("lang")
  }

  /** Incremental dedup, PRODUCTION shape ([[Dedup.buildKeyBloom]] →
    * [[graft.ops.KeyBloom.extend]] → [[graft.ops.KeyBloom.broadcastVia]] →
    * the `Broadcast` overload of [[Dedup.incrementalDedup]]): the corpus
    * splits into history (ids %3=0) and TWO arriving batches (%3=1, %3=2).
    * The corpus key filter is built ONCE over history, the first batch's
    * ACCEPTED rows extend it in place (no rebuild, no sizing count), and
    * each batch's plan tests membership via the broadcast handle
    * ([[graft.functions.BloomMightContain]] — scan-side, codegen). Bloom
    * misses provably skip the anti-join; hits (true dups + ~fpp false
    * positives) clear through it, so the oracle — the plain two-stage
    * NOT IN + min-id sequence — must match exactly.
    */
  private def qIncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val key = xxhash64(TF.contentFingerprint(col("text")))
    val history = docs.filter(col("doc_id") % 3 === 0)
    val batch1 = docs.filter(col("doc_id") % 3 === 1)
    val batch2 = docs.filter(col("doc_id") % 3 === 2)
    // build once, sized for the corpus's target cardinality
    val kb = Dedup.buildKeyBloom(history, key, expectedKeys = 1000000L)
    val kept1 = Dedup
      .incrementalDedup(batch1, history, "doc_id", key, kb.broadcastVia(spark))
      .localCheckpoint(true) // accepted batch materialized once: extend + history union reuse it
    kb.extend(kept1, key) // maintenance path: no rebuild from history+batch1
    val kept2 = Dedup.incrementalDedup(
      batch2, history.unionByName(kept1), "doc_id", key, kb.broadcastVia(spark))
    kept1.select("doc_id").unionByName(kept2.select("doc_id"))
      .agg(count(lit(1)).as("n_new"), sum("doc_id").as("id_sum"),
        sum(when(col("doc_id") % 3 === 1, 1L).otherwise(0L)).as("n_b1"))
  }

  /** Unicode canonicalization ([[graft.functions.UnicodeNormalize]]: NFC +
    * casefold + whitespace collapse) over the corpus, pinned by length sum
    * and distinct count; the oracle reproduces it with DuckDB's own
    * nfc_normalize + lower + regexp whitespace collapse.
    */
  private def qTextNormalize(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(graft.functions.UnicodeNormalize(col("text")).as("norm"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("norm"))).as("total_len"),
        countDistinct(col("norm")).as("n_distinct"))

  /** The pipeline WRITE path ([[graft.ops.PartitionedSink]]): documents →
    * lang-partitioned, doc_id-clustered parquet (salted shuffle bounds
    * files-per-partition and spreads the skewed-language case) → read back
    * and re-aggregate. The oracle aggregates the source directly, so any
    * row lost, duplicated, or mis-partitioned by the write shows up as a
    * checksum mismatch. Pruning/clustering of the layout is plan-asserted
    * in PartitionedSinkSpec.
    */
  private def qPartitionedWrite(spark: SparkSession, dir: String): DataFrame = {
    val key = tmpKey(dir)
    val out = s"/tmp/graft_psink_q/$key"
    PartitionedSink.writePartitioned(
      t(spark, dir, "documents"), out, Seq("lang"), Seq("doc_id"))
    spark.read.parquet(out)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"),
        sum(length(col("text"))).as("text_len"))
      .orderBy("lang")
  }

  /** Keyed partition upsert ([[PartitionedSink.upsertByKey]]) — the
    * patch-the-corpus maintenance op: base corpus written partitioned by
    * lang, then one batch REPLACES every doc_id % 4 == 0 row (n_chars +
    * 1000) and INSERTS re-keyed copies of the % 10 == 0 docs; only
    * touched partitions rewrite (dynamic overwrite). The read-back
    * aggregate must equal the merged expectation the oracle computes
    * from the documents table directly.
    */
  private def qPartitionUpsert(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select("doc_id", "lang", "n_chars", "source")
    val out = s"/tmp/graft_upsert_q/${tmpKey(dir)}"
    deleteRec(new java.io.File(out))
    PartitionedSink.writePartitioned(docs, out, Seq("lang"), Seq("doc_id"))
    val replace = docs.filter(col("doc_id") % 4 === 0)
      .withColumn("n_chars", col("n_chars") + 1000)
    val insert = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 3000000L)
    PartitionedSink.upsertByKey(replace.unionByName(insert), out, "lang", "doc_id",
      sortCols = Seq("doc_id"))
    spark.read.parquet(out)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"),
        sum("n_chars").cast("long").as("sum_chars"))
      .orderBy("lang")
  }

  /** Per-group embedding centroids via the custom
    * [[graft.functions.VectorMean]] AGGREGATE (TypedImperativeAggregate
    * with map-side combine — one (count, sums[dim]) buffer per group per
    * task instead of dim scalar rows). Element-wise half-up rounding makes
    * the distributed float sum comparable; the oracle rebuilds the same
    * means with unnest + avg-per-position. The vector is emitted as a
    * comma-joined string of the rounded 1e4-scaled INTEGER values (not an
    * array column): integer-stringification is bit-exact cross-engine and
    * the driver's pandas row-sort cannot hash array cells.
    */
  private def qEmbedCentroids(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(pmod(col("vec_id"), lit(4)).as("grp"),
        col("embedding").cast("array<double>").as("v"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        concat_ws(",", transform(graft.functions.VectorMean(col("v")),
          x => floor(x * 10000 + lit(0.5)).cast("long").cast("string"))).as("centroid"))
      .orderBy("grp")

  /** Per-group embedding DISPERSION — the outlier diagnostic a curation
    * pipeline runs before trusting an embedding column: centroid per group
    * (the [[graft.functions.VectorMean]] aggregate), then every vector's
    * codegen cosine to its group centroid, aggregated to avg/min (min =
    * the worst outlier). Composes the custom aggregate with the custom
    * scalar expression in one plan: agg → broadcast join → codegen scoring.
    */
  private def qEmbedDispersion(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
      .select(pmod(col("vec_id"), lit(4)).as("grp"),
        col("embedding").cast("array<double>").as("v"))
    val cents = emb.groupBy("grp").agg(graft.functions.VectorMean(col("v")).as("c"))
    emb.join(broadcast(cents), "grp")
      .select(col("grp"), graft.functions.CosineSimilarity(col("v"), col("c")).as("cos"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), r(avg("cos"), 3).as("avg_cos"),
        r(min("cos"), 3).as("min_cos"))
      .orderBy("grp")
  }

  private def qEmbedTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** Recall of an ANN result set vs the exact brute-force top-k, folded to
    * one oracle-checkable row: the oracle reproduces the EXACT side
    * (n_exact, n_queries — same ranking as q_embed_topk) and the recall
    * boolean is an in-query invariant over that exact set.
    */
  private def annRecallRow(
      exact: DataFrame, approx: DataFrame, minRecall: Double): DataFrame =
    exact.select("query_id", "neighbor_id")
      .join(approx.select(col("query_id"), col("neighbor_id"), lit(1).as("__hit"))
          .dropDuplicates("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n_exact"),
        countDistinct(col("query_id")).as("n_queries"),
        (sum(coalesce(col("__hit"), lit(0))).cast("double") /
          count(lit(1)).cast("double") >= minRecall).as("recall_ok"))

  private def qEmbedLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
      dim = 64, nPlanes = 3, tables = 16)
    annRecallRow(exact, approx, 0.9)
  }

  private def qEmbedIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val model = graft.ops.IvfIndex.train(emb, "vec_id", "embedding", nLists = 16, iterations = 3)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
    val approx = graft.ops.IvfIndex.search(model, emb, queries, "vec_id", "embedding", 5, nProbe = 8)
    annRecallRow(exact, approx, 0.9)
  }

  /** Embedding-cosine near-duplicate detection (dedup family): exact
    * all-pairs on a bounded id-subset so the DuckDB oracle can reproduce it
    * (the unbounded scale path is LSH/IVF blocking, q_embed_lsh/_ivf).
    */
  private def qEmbedNeardup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions._
    val sub = t(spark, dir, "embeddings").filter(col("vec_id") < 2000)
    // probe side must be spread: a single-file subset is 1 partition and the
    // broadcast nested-loop join would otherwise run on 1 task
    val a = spread(sub).select(col("vec_id").as("ida"), toDoubleArray(col("embedding")).as("__va"))
    val b = sub.select(col("vec_id").as("idb"), toDoubleArray(col("embedding")).as("__vb"))
    a.join(broadcast(b), col("ida") < col("idb"))
      .withColumn("c", cosineSimilarity(col("__va"), col("__vb")))
      .filter(col("c") >= 0.4)
      .agg(count(lit(1)).as("n_pairs"), r(avg("c"), 3).as("avg_cos"))
  }

  /** SemDeDup-style semantic dedup ([[graft.ops.SemDedup]]): IVF-cell
    * blocking + within-cell cosine near-dup + min-id keep. The coarse
    * quantizer trains with iterations = 0 so centroids are bit-exact
    * copies of the 8 lowest-id vectors and the DuckDB oracle re-derives
    * the cell assignment exactly (argmin of the SEQUENTIAL squared-L2
    * sum — identical IEEE op order on both engines; NearestCentroids'
    * (distance, cell) tie-break == the oracle's ORDER BY dist, cell).
    * Lloyd refinement (the production default) only moves centroids, not
    * the operator shape. The oracle enumerates the exact within-cell
    * pair set, so blocking, scoring, threshold, and keep rule are all
    * checked — not just a row count.
    */
  private def qSemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val model = graft.ops.IvfIndex.train(emb, "vec_id", "embedding", nLists = 8, iterations = 0)
    graft.ops.SemDedup.semanticDedup(model, emb, "vec_id", "embedding", 0.4)
      .groupBy("label")
      .agg(count(lit(1)).as("n_kept"), sum("vec_id").as("id_sum"))
      .orderBy("label")
  }

  /** Semantic decontamination ([[graft.ops.SemDedup.crossSetPairs]]):
    * embedding-space eval-set leakage — corpus vectors cosine-near an
    * eval vector (every 10th id), compared only within the shared IVF
    * cell. Same iterations=0 bit-exact cell oracle as q_semantic_dedup;
    * eval-side broadcast, corpus x corpus never compared.
    */
  private def qSemanticDecontam(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val model = graft.ops.IvfIndex.train(emb, "vec_id", "embedding",
      nLists = 8, iterations = 0)
    graft.ops.SemDedup.crossSetPairs(model,
        emb.filter(col("vec_id") % 10 =!= 0),
        emb.filter(col("vec_id") % 10 === 0),
        "vec_id", "embedding", 0.4, carryCols = Seq("label"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("corpus_id")).as("n_flagged"),
        r(avg(col("cosine")), 3).as("avg_cos"))
      .orderBy("label")
  }

  /** IVF ingest/drift monitoring ([[graft.ops.IvfIndex
    * .assignmentStats]]): the retrain trigger of the index lifecycle —
    * a quantizer trained on the even-id slice (iterations = 0 → bit-exact
    * lowest-even-id centroids the oracle re-derives) watches the odd-id
    * batch arrive: per-cell counts and 1e12-scaled LONG squared
    * distances to the assigned centroid, exact cross-engine.
    */
  private def qIvfDrift(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val model = graft.ops.IvfIndex.train(
      emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
      nLists = 8, iterations = 0)
    graft.ops.IvfIndex.assignmentStats(
        model, spread(emb.filter(col("vec_id") % 2 === 1)), "embedding")
      .orderBy("cell")
  }

  /** Product quantization ([[graft.ops.Pq]]): 4 blocks x 16-centroid
    * codebooks over the 64-dim embeddings — the storage half of IVF-PQ
    * (64 floats -> 4 codes). iterations = 0 keeps every codebook a
    * bit-exact slice of the 16 lowest-id vectors, so the oracle
    * re-derives codebooks, codes, AND scaled reconstruction errors
    * exactly (argmin parity per qSemanticDedup; the per-block scaled
    * error uses the q_embed_quantize list_sum fold, proven bit-stable).
    */
  private def qEmbedPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val model = graft.ops.Pq.train(emb, "vec_id", "embedding", blocks = 4, codebookSize = 16)
    spread(emb)
      .withColumn("code", graft.ops.Pq.encode(col("embedding"), model))
      .withColumn("errs", graft.ops.Pq.scaledSqError(col("embedding"), col("code"), model))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(aggregate(col("errs"), lit(0L), (a, e) => a + e)).as("sum_scaled_sqerr"),
        max(aggregate(col("code"), lit(0), (a, c) => greatest(a, c))).cast("long").as("max_code"),
        min(size(col("code"))).cast("long").as("code_len"))
      .orderBy("label")
  }

  /** SemDeDup with QUALITY keep-best (the full published shape): same
    * cell blocking as [[qSemanticDedup]], but the keeper of each
    * near-identical pair is the higher-quality document (exact-0.5-step
    * raw score joined 1:1 from the documents table; min id on ties) —
    * the curation rule real corpus teams run. The oracle recomputes
    * cells, pairs, per-doc quality, and the loser rule.
    */
  private def qSemanticKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val quality = t(spark, dir, "documents")
      .select(col("doc_id").as("vec_id"), TF.qualityScoreRaw(col("text")).as("q"))
    val corpus = emb.join(quality, Seq("vec_id"))
    val model = graft.ops.IvfIndex.train(corpus, "vec_id", "embedding", nLists = 8, iterations = 0)
    graft.ops.SemDedup.semanticDedup(model, corpus, "vec_id", "embedding", 0.4,
        score = col("q"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_kept"), sum("vec_id").as("id_sum"))
      .orderBy("label")
  }

  /** PQ ADC search ([[graft.ops.Pq.adcSearch]]) — the search half of
    * IVF-PQ: per-query distance TABLES against every codebook centroid,
    * corpus scored by `blocks` integer table lookups per vector. The
    * 1e12-scaled long distances make the ranking deterministic, so the
    * oracle re-derives the EXACT result set (codes + tables + ranks) —
    * no recall envelope needed, unlike the LSH/IVF rows.
    */
  private def qEmbedAdc(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val model = graft.ops.Pq.train(emb, "vec_id", "embedding", blocks = 4, codebookSize = 16)
    graft.ops.Pq.adcSearch(model, emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", 5)
      .withColumn("rank", col("rank").cast("long")) // DuckDB row_number is BIGINT
      .orderBy("query_id", "rank")
  }

  /** Full IVF-PQ search ([[graft.ops.Pq.ivfPqSearch]]): coarse 16-cell
    * routing (nProbe = 4 — the candidate set shrinks to ~1/4 of the
    * corpus BEFORE any scoring) + PQ-ADC integer table lookups. Both
    * quantizers train at iterations = 0 from the same 16 lowest-id
    * vectors, so the oracle re-derives routing, codes, tables, and
    * ranks exactly — like q_embed_adc, no recall envelope needed.
    */
  private def qEmbedIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val coarse = graft.ops.IvfIndex.train(emb, "vec_id", "embedding",
      nLists = 16, iterations = 0)
    val pq = graft.ops.Pq.train(emb, "vec_id", "embedding", blocks = 4, codebookSize = 16)
    graft.ops.Pq.ivfPqSearch(coarse, pq, emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nProbe = 4)
      .withColumn("rank", col("rank").cast("long")) // DuckDB row_number is BIGINT
      .orderBy("query_id", "rank")
  }

  /** Two-stage retrieval ([[graft.ops.Similarity.rerankExact]]): IVF-PQ
    * supplies 20 cheap ADC candidates per query, then EXACT cosine
    * re-ranks the survivors to the final top-5 — the approximate-recall /
    * exact-precision split every production vector store runs. Rank-only
    * output (the q_embed_topk pattern: float cosines never cross the
    * oracle boundary, orderings must agree).
    */
  private def qAnnRerank(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val coarse = graft.ops.IvfIndex.train(emb, "vec_id", "embedding",
      nLists = 16, iterations = 0)
    val pq = graft.ops.Pq.train(emb, "vec_id", "embedding", blocks = 4, codebookSize = 16)
    val cands = graft.ops.Pq.ivfPqSearch(coarse, pq, emb, queries,
      "vec_id", "embedding", k = 20, nProbe = 4)
    Similarity.rerankExact(cands, emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** PCA whitening of the embedding corpus ([[graft.ops.Whitening]]):
    * train = two distributed reductions (mean + d x d scatter, primitive
    * per-partition accumulators) and a driver-side 64x64 Jacobi
    * eigensolve; apply = one broadcast d² kernel per row. The
    * eigendecomposition is not SQL-expressible, but its CONTRACT is: the
    * readout counts components whose post-whitening mean is 0 and
    * variance is 1, and the oracle states the mathematically-forced
    * answer (all d of them, over the modal-dimension corpus) — so the
    * DuckDB hash-compare grades the whole train+apply path, with
    * WhiteningSpec's closed-form gates covering the eigensolve itself.
    */
  private def qEmbedWhiten(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val model = graft.ops.Whitening.train(emb, "embedding")
    val w = graft.ops.Whitening.whiten(emb, "embedding", "wvec", model)
    val comp = w.select(posexplode(col("wvec")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"))
      .select(col("pos"), col("n"), (col("sx") / col("n")).as("m"),
        (col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n"))).as("v"))
    comp.agg(
        max("n").as("n_vecs"),
        count(lit(1)).as("n_components"),
        sum(when(abs(col("m")) < 1e-6, 1L).otherwise(0L)).as("n_zero_mean"),
        sum(when(abs(col("v") - 1.0) < 0.01, 1L).otherwise(0L)).as("n_unit_var"))
  }

  /** Multi-format scan/sink round-trip (SURVEY.md §2B "scans: other
    * formats / sinks"): the same event subset written as CSV and JSON,
    * read back, joined, and aggregated — oracle reproduces from the
    * original table.
    */
  private def qMultiFormat(spark: SparkSession, dir: String): DataFrame = {
    val sub = events(spark, dir).filter(col("event_id") < 1000)
      .select("event_id", "event_type", "value")
    val base = oncePerDir(
        s"/tmp/graft_formats/${tmpKey(dir)}", "orc/_SUCCESS") {
      val b = s"/tmp/graft_formats/${tmpKey(dir)}"
      sub.write.mode("overwrite").option("header", "true").csv(s"$b/csv")
      sub.write.mode("overwrite").json(s"$b/json")
      sub.write.mode("overwrite").orc(s"$b/orc") // orc last = the sentinel
    }
    val fromCsv = spark.read.option("header", "true")
      .schema("event_id LONG, event_type STRING, value DOUBLE").csv(s"$base/csv")
    val fromJson = spark.read.schema("event_id LONG, event_type STRING, value DOUBLE")
      .json(s"$base/json")
    val fromOrc = spark.read.orc(s"$base/orc")
    fromCsv.alias("c")
      .join(fromJson.alias("j"), Seq("event_id"))
      .join(fromOrc.alias("o"), Seq("event_id"))
      .filter(col("c.event_type") === col("j.event_type") &&
        col("c.event_type") === col("o.event_type"))
      .groupBy(col("c.event_type").as("event_type"))
      .agg(count(lit(1)).as("n"),
        r(sum(col("c.value") + col("j.value") + col("o.value")), 2).as("sum3"))
      .orderBy("event_type")
  }

  /** Schema-evolution read (SURVEY.md §2B scans): two parquet generations
    * of the same table — an early one WITHOUT the `value` column and a
    * later one with it — read together under `mergeSchema`, the
    * append-only ingest reality at 100 TB (schemas drift; rewriting old
    * files is off the table). Old-generation rows surface the added
    * column as NULL; the readout pins exactly that (null counts + the
    * new-generation value sum). Schema union happens at PLAN time from
    * footers — no data pass.
    */
  private def qSchemaMerge(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val base = oncePerDir(
        s"/tmp/graft_schemamerge/${tmpKey(dir)}", "gen2/_SUCCESS") {
      val b = s"/tmp/graft_schemamerge/${tmpKey(dir)}"
      ev.filter(col("event_id") < 500)
        .select("event_id", "event_type")
        .write.mode("overwrite").parquet(s"$b/gen1")
      ev.filter(col("event_id") >= 500 && col("event_id") < 1000)
        .select("event_id", "event_type", "value")
        .write.mode("overwrite").parquet(s"$b/gen2") // gen2 last = sentinel
    }
    spark.read.option("mergeSchema", "true")
      .parquet(s"$base/gen1", s"$base/gen2")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_pre_schema"),
        sum(floor(col("value") * 1000000).cast("long")).as("sum_value_u"))
      .orderBy("event_type")
  }

  /** Tokenizer vocabulary coverage (OOV rate): vocabulary = every token
    * with corpus frequency >= 50 (THRESHOLD-based, not top-k — a top-k
    * boundary tie would be broken by token identity, which the two
    * engines don't share: Spark sees hashes, the oracle sees strings);
    * readout = per-language token totals and the ppm share of
    * out-of-vocabulary occurrences. One tokenize pass → token counts
    * (map-side combine), one join of per-doc token counts against the
    * vocab — both plain shuffled hash joins, nothing driver-sized.
    */
  private def qOovRate(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(t(spark, dir, "documents"))
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(TF.tokenHashes(col("text"))).as("th"))
    val tf = tok.groupBy("lang", "th").agg(count(lit(1)).as("cnt"))
    val vocab = tf.groupBy("th").agg(sum("cnt").as("total"))
      .filter(col("total") >= 50).select("th")
    tf.join(vocab.withColumn("__in", lit(1L)), Seq("th"), "left")
      .groupBy("lang")
      .agg(sum("cnt").as("n_tokens"),
        sum(when(col("__in").isNull, col("cnt")).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("n_oov * 1000000 div n_tokens"))
      .orderBy("lang")
  }

  /** Ranking-window suite (§2B window functions beyond topk/lag):
    * `ntile`, `percent_rank`, `cume_dist` over a UNIQUE total order
    * (price, key — ties would make ntile membership engine-dependent).
    * Readout keeps only order-independent per-bucket extremes (an AVG of
    * doubles would inherit partition summation order).
    */
  private def qWindowSuite(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("q4", ntile(4).over(w).cast("long"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .groupBy("o_orderpriority", "q4")
      .agg(count(lit(1)).as("n"),
        r(min("pr"), 6).as("min_pr"), r(max("pr"), 6).as("max_pr"),
        r(max("cd"), 6).as("max_cd"))
      .orderBy("o_orderpriority", "q4")
  }

  /** String-function suite (§2B scalars beyond the basics): levenshtein
    * (identical DP algorithm in both engines — exact integers), translate,
    * lpad, initcap-style casing on the dialect-free customer names, one
    * scan, no shuffle beyond the final bounded aggregate.
    */
  private def qStringSuite(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .select(col("c_custkey"),
        levenshtein(col("c_name"), reverse(col("c_name"))).cast("long").as("lev"),
        length(translate(col("c_name"), "0", "")).cast("long").as("len_no_zero"),
        lpad(col("c_custkey").cast("string"), 12, "0").as("padded"))
      .groupBy((col("lev") % 4).as("lev_bucket"))
      .agg(count(lit(1)).as("n"), sum("len_no_zero").as("sum_len"),
        max("padded").as("max_padded"))
      .orderBy("lev_bucket")

  /** Conditional/boolean aggregate suite: `count_if`, `bool_and`,
    * `bool_or`, plus filtered aggregation — the audit-flag readouts every
    * constraint system compiles to, one pass, map-side combinable.
    */
  private def qCondAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        expr("count_if(o_totalprice > 150000)").as("n_big"),
        expr("bool_or(o_orderstatus = 'F')").as("any_f"),
        expr("bool_and(o_totalprice > 0)").as("all_positive"),
        max(when(col("o_orderstatus") === "O", col("o_orderkey"))).as("max_open_key"))
      .orderBy("o_orderpriority")

  /** Incremental aggregate maintenance (the nightly-rollup pattern):
    * yesterday's per-type rollup is COMBINED with the delta batch's
    * rollup — `union → re-aggregate` over two already-tiny partial
    * frames, the base data is never rescanned. count/sum/min/max are the
    * mergeable-state aggregates (the same algebra the [[qHllSketchUnion]]
    * / [[qValueHistogram]] sketches extend to distincts/quantiles); the
    * oracle computes the full-scan answer, certifying merge ≡ rescan.
    */
  private def qIncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .withColumn("vu", floor(col("value") * 1000000).cast("long"))
    def rollup(df: DataFrame): DataFrame = df.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("vu").as("sum_vu"),
        min("vu").as("min_vu"), max("vu").as("max_vu"))
    val base = rollup(ev.filter(col("event_id") < 8000))   // "yesterday"
    val delta = rollup(ev.filter(col("event_id") >= 8000)) // tonight's batch
    base.union(delta)
      .groupBy("event_type")
      .agg(sum("n").as("n"), sum("sum_vu").as("sum_vu"),
        min("min_vu").as("min_vu"), max("max_vu").as("max_vu"))
      .orderBy("event_type")
  }

  /** Date/time function suite (§2A's DATE semantics widened):
    * add_months, last_day, quarter, dayofweek, date_trunc to quarter —
    * calendar arithmetic both engines must agree on exactly.
    */
  private def qDateSuite(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("d", col("o_orderdate").cast("date"))
      .groupBy(quarter(col("d")).cast("long").as("q"))
      .agg(count(lit(1)).as("n"),
        max(add_months(col("d"), 3)).cast("string").as("max_plus3m"),
        max(last_day(col("d"))).cast("string").as("max_month_end"),
        sum(dayofweek(col("d")).cast("long")).as("sum_dow"),
        min(date_trunc("quarter", col("d")).cast("date")).cast("string").as("min_q_start"))
      .orderBy("q")

  /** Bag-semantics set operations (UNION/INTERSECT/EXCEPT **ALL** — the
    * multiplicity-preserving corner [[qSetops]]'s DISTINCT forms don't
    * touch): row multisets built from two order slices, counted after
    * each ALL operator.
    */
  private def qSetopsAll(spark: SparkSession, dir: String): DataFrame = {
    val a = t(spark, dir, "orders").filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderpriority").as("p"))
    val b = t(spark, dir, "orders").filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderpriority").as("p"))
    val u = a.unionAll(b).groupBy("p").agg(count(lit(1)).as("n_union_all"))
    val i = a.intersectAll(b).groupBy("p").agg(count(lit(1)).as("n_intersect_all"))
    val e = a.exceptAll(b).groupBy("p").agg(count(lit(1)).as("n_except_all"))
    u.join(i, Seq("p"), "left").join(e, Seq("p"), "left")
      .na.fill(0L, Seq("n_intersect_all", "n_except_all"))
      .orderBy("p")
  }

  /** Null-semantics suite: null-safe equality (`<=>` / IS NOT DISTINCT
    * FROM), `nullif`, `nvl2`-style branching, and coalesce chains over a
    * column with SYNTHESIZED nulls — the exact corner where engines
    * diverge silently; every readout is an integer count.
    */
  private def qNullSuite(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      // every 7th order loses its status (deterministic null planting)
      .withColumn("st", when(col("o_orderkey") % 7 =!= 0, col("o_orderstatus")))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        count(col("st")).as("n_status"),
        sum(when(col("st") <=> lit("F"), 1L).otherwise(0L)).as("n_f_nullsafe"),
        sum(when(col("st") <=> lit(null), 1L).otherwise(0L)).as("n_null_nullsafe"),
        sum(when(expr("nullif(st, 'O')").isNull, 1L).otherwise(0L)).as("n_nullif_o"),
        sum(coalesce(length(col("st")).cast("long"), lit(-1L))).as("sum_coalesced"))
      .orderBy("o_orderpriority")

  /** Decimal (money) arithmetic: prices cast to DECIMAL(18,2) and summed
    * EXACTLY — the no-float-drift contract double summation can't give;
    * sums are emitted as canonical strings so the parity check is on the
    * exact decimal value, not a dtype representation.
    */
  private def qDecimal(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("p", col("o_totalprice").cast("decimal(18,2)"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum("p").cast("decimal(28,2)").cast("string").as("sum_price"),
        max("p").cast("string").as("max_price"),
        min("p").cast("string").as("min_price"))
      .orderBy("o_orderstatus")

  /** ANSI SQL entry point (the `spark.sql` surface next to the DataFrame
    * API every other query uses): the TPC-H Q3 shipping-priority shape —
    * 3-way join, selective date filters both sides, grouped revenue,
    * global top-10. Revenue is exact integer CENTS (`floor(price·(1−disc)
    * ·100)` — the identical IEEE sequence both engines run), so the
    * ranking is deterministic; ties break on the key. The plan is the
    * classic broadcast(customer-filter) + shuffled lineitem join +
    * TakeOrdered.
    */
  private def qTpchQ3(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("customer")
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    t(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT o_orderkey,
        |       sum(cast(floor(l_extendedprice * (1 - l_discount) * 100) as bigint))
        |         AS revenue_c,
        |       cast(cast(o_orderdate as date) as string) AS order_date
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < timestamp '1998-06-01 00:00:00'
        |  AND l_shipdate > timestamp '1998-06-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue_c DESC, o_orderkey
        |LIMIT 10""".stripMargin)
  }

  /** Correlated scalar subquery (Catalyst decorrelation): orders priced
    * at their customer's maximum, written AS the correlated form — the
    * optimizer rewrites it into an aggregate + join (no per-row
    * re-execution), which is the only shape that survives 100 TB. The
    * oracle runs the IDENTICAL correlated SQL text in DuckDB.
    */
  private def qCorrelatedSubq(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o.o_orderpriority AS pri, count(*) AS n_max_orders,
        |       cast(sum(cast(floor(o.o_totalprice * 100) as bigint)) as bigint)
        |         AS sum_price_c
        |FROM orders o
        |WHERE o.o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
        |                        WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** TPC-H Q5 shape (local-supplier revenue by nation): the 6-way
    * snowflake join — lineitem⋈orders⋈customer⋈supplier⋈nation⋈region
    * with the local-supplier condition `c_nationkey = s_nationkey` — in
    * exact integer cents. The dims broadcast, the two fact joins
    * shuffle once each; the classic plan AQE should pick unaided.
    */
  private def qTpchQ5(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(
      """SELECT n_name,
        |       sum(cast(floor(l_extendedprice * (1 - l_discount) * 100) as bigint))
        |         AS revenue_c
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= timestamp '1996-01-01 00:00:00'
        |  AND o_orderdate <  timestamp '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue_c DESC, n_name""".stripMargin)
  }

  /** TPC-H Q6 shape (forecast revenue change): the pure scan-filter-
    * aggregate — no join at all; the whole query is one codegen'd stage
    * whose filters push to the parquet scan. Integer-cents readout.
    */
  private def qTpchQ6(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(floor(col("l_extendedprice") * col("l_discount") * 100).cast("long"))
        .as("revenue_c"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q10 shape (returned-item losses by customer): top 20
    * customers by revenue lost to returns — fact joins + one bounded
    * TakeOrdered, nation broadcast.
    */
  private def qTpchQ10(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "nation")
      .foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(
      """SELECT c_custkey, c_name, n_name,
        |       sum(cast(floor(l_extendedprice * (1 - l_discount) * 100) as bigint))
        |         AS revenue_c
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= timestamp '1996-01-01 00:00:00'
        |  AND o_orderdate <  timestamp '1996-07-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_c DESC, c_custkey
        |LIMIT 20""".stripMargin)
  }

  /** TPC-H Q1 (pricing summary) in full: per (returnflag, linestatus)
    * sums/counts with the derived charge expression — every money column
    * an exact integer-cents sum, the averages integer divisions of those
    * sums (a float `avg()` would inherit partition summation order).
    */
  private def qTpchQ1(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       cast(sum(cast(l_quantity as bigint)) as bigint) AS sum_qty,
        |       sum(cast(floor(l_extendedprice * 100) as bigint)) AS sum_base_c,
        |       sum(cast(floor(l_extendedprice * (1 - l_discount) * 100) as bigint))
        |         AS sum_disc_c,
        |       sum(cast(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
        |           as bigint)) AS sum_charge_c,
        |       count(*) AS n,
        |       sum(cast(floor(l_extendedprice * 100) as bigint)) div count(*)
        |         AS avg_price_c,
        |       sum(cast(floor(l_discount * 10000) as bigint)) div count(*)
        |         AS avg_disc_bp
        |FROM lineitem
        |WHERE l_shipdate <= timestamp '2001-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** TPC-H Q18 shape (large-volume customers): `IN` over a HAVING-
    * filtered aggregate subquery — Catalyst plans the IN as a semi-join
    * against the aggregated subquery, never a per-row probe. Quantities
    * are integral doubles, so the sums are exact.
    */
  private def qTpchQ18(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem")
      .foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(
      """SELECT c_custkey, c_name, o_orderkey,
        |       cast(sum(cast(l_quantity as bigint)) as bigint) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        |GROUP BY c_custkey, c_name, o_orderkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 20""".stripMargin)
  }

  /** TPC-H Q14 shape (promotion effect): lineitem⋈part with a
    * conditional revenue share — promo share in exact ppm (integer-cents
    * numerator and denominator, split-free integer division since the
    * numerator is bounded by the denominator × 1e6 ≪ 2^63 at any
    * realistic month's revenue... in cents × ppm terms the product stays
    * inside a long for monthly slices; the month filter is what bounds
    * it, exactly as in the official query).
    */
  private def qTpchQ14(spark: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "part").foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(
      """SELECT sum(case when p_type = 'PROMO'
        |               then cast(floor(l_extendedprice * (1 - l_discount) * 100) as bigint)
        |               else 0L end) AS promo_c,
        |       sum(cast(floor(l_extendedprice * (1 - l_discount) * 100) as bigint))
        |         AS total_c,
        |       sum(case when p_type = 'PROMO'
        |               then cast(floor(l_extendedprice * (1 - l_discount) * 100) as bigint)
        |               else 0L end) * 1000000
        |         div sum(cast(floor(l_extendedprice * (1 - l_discount) * 100) as bigint))
        |         AS promo_ppm
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= timestamp '1996-03-01 00:00:00'
        |  AND l_shipdate <  timestamp '1996-04-01 00:00:00'""".stripMargin)
  }

  /** Registers the full TPC-H star schema as temp views — shared by the
    * Q2/Q4/Q7..Q22 battery below. */
  private def tpchViews(spark: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  /** TPC-H Q2 shape (minimum-cost supplier): the correlated MIN subquery
    * over a region-restricted offer set, decorrelated by Catalyst into an
    * aggregate + join (never a per-part re-execution). The testdata has no
    * partsupp table, so the part↔supplier offer relation is derived from
    * lineitem (min sale cents per pair) — the correlated-aggregate shape,
    * which is what Q2 exercises, is unchanged.
    */
  private def qTpchQ2(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """WITH offer AS (
        |  SELECT l_partkey, l_suppkey,
        |         min(cast(floor(l_extendedprice * 100) as bigint)) AS offer_c
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT p_partkey, s_name, n_name,
        |       cast(floor(s_acctbal * 100) as bigint) AS s_acctbal_c, o.offer_c
        |FROM part, offer o, supplier, nation, region
        |WHERE p_partkey = o.l_partkey AND s_suppkey = o.l_suppkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE' AND p_size = 15
        |  AND o.offer_c = (
        |    SELECT min(o2.offer_c) FROM offer o2, supplier s2, nation n2, region r2
        |    WHERE o2.l_partkey = p_partkey AND s2.s_suppkey = o2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
        |      AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey
        |LIMIT 20""".stripMargin)
  }

  /** TPC-H Q4 shape (order-priority checking): EXISTS over lineitem with a
    * non-trivial correlated predicate — shipped >30 days after the order
    * date (the testdata has no commit/receipt dates; the late-ship test in
    * exact epoch-microsecond arithmetic keeps both engines cutting the
    * boundary identically). Catalyst plans the EXISTS as a left semi join.
    */
  private def qTpchQ4(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= timestamp '1996-07-01 00:00:00'
        |  AND o_orderdate <  timestamp '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND unix_micros(cast(l_shipdate as timestamp))
        |                  - unix_micros(cast(o_orderdate as timestamp))
        |                    > 2592000000000)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** TPC-H Q7 (volume shipping): the two-nation bidirectional trade flow —
    * nation joined twice under different roles (supplier side and customer
    * side), disjunctive pair predicate, revenue by year in exact cents.
    */
  private def qTpchQ7(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """SELECT supp_nation, cust_nation, yr,
        |       cast(sum(vol_c) as bigint) AS revenue_c
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |             cast(year(l_shipdate) as bigint) AS yr,
        |             cast(floor(l_extendedprice * (1 - l_discount) * 100) as bigint)
        |               AS vol_c
        |      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |      JOIN orders ON o_orderkey = l_orderkey
        |      JOIN customer ON c_custkey = o_custkey
        |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |          OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        |        AND l_shipdate >= timestamp '1996-01-01 00:00:00'
        |        AND l_shipdate <  timestamp '1998-01-01 00:00:00') shipping
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)
  }

  /** TPC-H Q8 (national market share): one nation's share of a region's
    * import volume per year, in exact ppm — integer-cents numerator and
    * denominator with `div`, never a float ratio. Nation joins twice
    * (customer region membership vs supplier origin).
    */
  private def qTpchQ8(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """WITH all_nations AS (
        |  SELECT cast(year(o_orderdate) as bigint) AS yr,
        |         cast(floor(l_extendedprice * (1 - l_discount) * 100) as bigint)
        |           AS vol_c,
        |         n2.n_name AS supp_nation
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |    AND o_orderdate >= timestamp '1996-01-01 00:00:00'
        |    AND o_orderdate <  timestamp '1998-01-01 00:00:00')
        |SELECT yr,
        |       cast(sum(case when supp_nation = 'NATION_3' then vol_c else 0 end)
        |         as bigint) AS nation_c,
        |       cast(sum(vol_c) as bigint) AS total_c,
        |       cast(sum(case when supp_nation = 'NATION_3' then vol_c else 0 end)
        |         as bigint) * 1000000 div cast(sum(vol_c) as bigint) AS share_ppm
        |FROM all_nations GROUP BY yr ORDER BY yr""".stripMargin)
  }

  /** TPC-H Q9 shape (product-type profit): name-pattern part filter through
    * the full fact join, profit by supplier nation and order year. The
    * testdata has no partsupp.ps_supplycost, so profit is the discounted
    * revenue term only — the join/group topology Q9 exercises is intact.
    */
  private def qTpchQ9(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """SELECT n_name, cast(year(o_orderdate) as bigint) AS yr,
        |       sum(cast(floor(l_extendedprice * (1 - l_discount) * 100) as bigint))
        |         AS profit_c
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** TPC-H Q11 shape (important stock): per-part value within one region's
    * suppliers, kept when above a scalar-subquery threshold. The official
    * fixed fraction (0.0001/SF) is scale-dependent; this uses the
    * scale-free "above 1.5× the mean part value" — `value·n > 3·total div 2`
    * in exact integers, so the cut is identical in both engines at any SF.
    */
  private def qTpchQ11(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """WITH val AS (
        |  SELECT l_partkey AS partkey,
        |         sum(cast(floor(l_extendedprice * 100) as bigint)) AS value_c
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY 1)
        |SELECT partkey, cast(value_c as bigint) AS value_c
        |FROM val
        |WHERE value_c * (SELECT count(*) FROM val)
        |      > 3 * (SELECT sum(value_c) FROM val) div 2
        |ORDER BY value_c DESC, partkey""".stripMargin)
  }

  /** TPC-H Q12 shape (shipping-priority classes): the CASE-sum split of
    * late-shipped lines (>60 days after order, exact epoch-µs test — the
    * testdata has no ship mode or receipt date) into high/low order
    * priorities per line status.
    */
  private def qTpchQ12(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """SELECT l_linestatus AS ship_class,
        |       cast(sum(case when o_orderpriority in ('1-URGENT', '2-HIGH')
        |                then 1 else 0 end) as bigint) AS high_line_count,
        |       cast(sum(case when o_orderpriority not in ('1-URGENT', '2-HIGH')
        |                then 1 else 0 end) as bigint) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE unix_micros(cast(l_shipdate as timestamp))
        |      - unix_micros(cast(o_orderdate as timestamp)) > 5184000000000
        |  AND l_shipdate >= timestamp '1996-01-01 00:00:00'
        |  AND l_shipdate <  timestamp '1997-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** TPC-H Q13 (customer distribution): the LEFT OUTER join with an
    * ON-clause filter (customers keep their zero), per-customer order
    * count, then the histogram of counts — two aggregations with the
    * outer-join null semantics Q13 exists to test.
    */
  private def qTpchQ13(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """WITH c_orders AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |SELECT cast(c_count as bigint) AS c_count, count(*) AS custdist
        |FROM c_orders GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)
  }

  /** TPC-H Q15 (top supplier): the revenue view consumed twice — once as
    * the join input, once under a scalar MAX subquery — selecting the
    * quarter's best supplier(s) without any sort of the full view.
    */
  private def qTpchQ15(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(cast(floor(l_extendedprice * (1 - l_discount) * 100) as bigint))
        |           AS total_rev_c
        |  FROM lineitem
        |  WHERE l_shipdate >= timestamp '1996-01-01 00:00:00'
        |    AND l_shipdate <  timestamp '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, cast(total_rev_c as bigint) AS total_rev_c
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_rev_c = (SELECT max(total_rev_c) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** TPC-H Q16 shape (part-supplier relationship count): COUNT(DISTINCT)
    * per part attribute triple with a NOT IN exclusion subquery (negative-
    * balance suppliers standing in for the official complaint filter; the
    * part↔supplier relation comes from lineitem — no partsupp table).
    */
  private def qTpchQ16(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """SELECT p_brand, p_type, cast(p_size as bigint) AS p_size,
        |       cast(count(DISTINCT l_suppkey) as bigint) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 30""".stripMargin)
  }

  /** TPC-H Q17 (small-quantity-order revenue): the per-part average-
    * quantity threshold `qty < 0.2·avg(qty)` cross-multiplied into the
    * exact integer predicate `5·qty·cnt < sum_qty` (quantities are
    * integral) — no float average anywhere, so both engines cut the same
    * lines. The per-part aggregate joins back to the fact, the shape
    * Catalyst decorrelates the official correlated form into anyway.
    */
  private def qTpchQ17(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """WITH pq AS (
        |  SELECT l_partkey AS pk, sum(cast(l_quantity as bigint)) AS sum_qty,
        |         count(*) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT count(*) AS n_small,
        |       cast(sum(cast(floor(l_extendedprice * 100) as bigint)) as bigint)
        |         AS revenue_c
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |JOIN pq ON pk = l_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND cast(l_quantity as bigint) * 5 * cnt < sum_qty""".stripMargin)
  }

  /** TPC-H Q19 (disjunctive discounted revenue): the three-way OR of
    * brand/size/quantity envelopes — the predicate-pushdown stress test;
    * the whole disjunction evaluates scan-side after the part broadcast.
    */
  private def qTpchQ19(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """SELECT count(*) AS n_lines,
        |       cast(sum(cast(floor(l_extendedprice * (1 - l_discount) * 100) as bigint))
        |         as bigint) AS revenue_c
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)
  }

  /** TPC-H Q20 shape (excess-volume suppliers): the nested IN over a
    * HAVING-filtered (supplier, part) aggregate — planned as semi-join
    * chains, never row-at-a-time probes. Region filter instead of a single
    * nation (the smallest SF has no supplier in most single nations);
    * shipped-quantity threshold instead of the partsupp availability term.
    */
  private def qTpchQ20(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AFRICA'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        |    WHERE p_name LIKE 'small%'
        |      AND l_shipdate >= timestamp '1996-01-01 00:00:00'
        |      AND l_shipdate <  timestamp '1997-01-01 00:00:00'
        |    GROUP BY l_suppkey, l_partkey
        |    HAVING sum(cast(l_quantity as bigint)) > 40)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the double
    * correlated quantifier — EXISTS a co-supplier on the order AND NOT
    * EXISTS a co-supplier who shipped later (latest-shipper semantics over
    * l_shipdate; the testdata has no commit/receipt dates). Catalyst plans
    * the pair as semi + anti joins with the non-equi residual on the hash
    * key, the only shape that survives a fact-sized outer.
    */
  private def qTpchQ21(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND n_regionkey = (
        |        SELECT r_regionkey FROM region WHERE r_name = 'MIDDLE EAST')
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)
  }

  /** TPC-H Q22 shape (global sales opportunity): scalar-subquery average
    * threshold + anti-join, with the above-average test cross-multiplied
    * into exact integers (`bal_c·n_pos > sum_pos_c`) so no float average
    * crosses engines. Country code is `c_custkey % 10` (no phone column);
    * the anti-join excludes customers with urgent orders (every customer
    * has some order at every SF).
    */
  private def qTpchQ22(spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(
      """WITH pos AS (
        |  SELECT cast(floor(c_acctbal * 100) as bigint) AS bal_c
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT cast(c_custkey % 10 as bigint) AS cntrycode, count(*) AS numcust,
        |       cast(sum(cast(floor(c_acctbal * 100) as bigint)) as bigint)
        |         AS totacctbal_c
        |FROM customer
        |WHERE c_custkey % 10 IN (1, 3, 5, 7, 9)
        |  AND cast(floor(c_acctbal * 100) as bigint) * (SELECT count(*) FROM pos)
        |      > (SELECT sum(bal_c) FROM pos)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Recursive CTE (Spark 4.x `WITH RECURSIVE`): SQL-level iteration —
    * ancestor depths over the implicit binary supplier hierarchy
    * (`parent = suppkey div 2`), a transitive closure neither joins nor
    * window functions can express in one statement. Spark executes the
    * recursion as iterated union-all steps (each step one distributed
    * join against the previous frontier — the same shape as
    * [[graft.ops.Bfs]]); depth is bounded by log2(|supplier|), so the
    * iteration count grows logarithmically with data size. DuckDB runs
    * the identical text with `//` for integer division.
    */
  private def qRecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "supplier").createOrReplaceTempView("supplier")
    spark.sql(
      """WITH RECURSIVE anc AS (
        |  SELECT cast(0 as bigint) AS k, cast(0 as bigint) AS depth
        |  UNION ALL
        |  SELECT s_suppkey, depth + 1
        |  FROM supplier JOIN anc ON s_suppkey div 2 = anc.k
        |  WHERE s_suppkey > 0)
        |SELECT depth, count(*) AS n, cast(sum(k) as bigint) AS sum_k
        |FROM anc GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** LATERAL VIEW posexplode (ordinality-preserving explode): the first
    * 10 tokens of each document with their positions — the generator runs
    * scan-side inside whole-stage codegen (a Generate node, no shuffle
    * before the aggregate), and the per-(lang, pos) readout is bounded.
    * The DuckDB oracle reproduces ordinality with zip-unnest of
    * `range(...)` against the sliced token array.
    */
  private def qPosexplode(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "documents").createOrReplaceTempView("documents")
    spark.sql(
      """SELECT lang, cast(pos as bigint) AS pos, count(*) AS n,
        |       cast(sum(length(tok)) as bigint) AS sum_len
        |FROM documents
        |LATERAL VIEW posexplode(slice(split(text, ' '), 1, 10)) AS pos, tok
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** k-anonymity release gate ([[graft.ops.Anonymize]]): quasi-identifier
    * tuples (lang, source, length bucket) shared by fewer than k=5
    * documents are suppressed (quasi columns nulled); the readout counts
    * surviving rows per language with suppressed rows pooled under one
    * label — exactly the aggregate a privacy review reads. The oracle
    * recomputes the suppression from group sizes directly.
    */
  private def qKAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .withColumn("len_bucket", expr("n_chars div 500"))
    Anonymize.kAnonymize(docs, Seq("lang", "source", "len_bucket"), 5L)
      .groupBy(coalesce(col("lang"), lit("(suppressed)")).as("lang_out"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("lang_out")
  }

  /** Deterministic epoch shuffle: the global training order for epoch 0 is
    * `ORDER BY md5('epoch0:' || doc_id)` — reproducible across engines and
    * runs, re-keyable per epoch by changing the salt (the repo's
    * established md5 contract, see qPseudonymize). The readout takes the
    * first 20 positions via TakeOrdered (never a global window): LIMIT
    * first, then rank within the bounded result.
    */
  private def qEpochShuffle(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "documents").createOrReplaceTempView("documents")
    spark.sql(
      """WITH top AS (
        |  SELECT doc_id, md5(concat('epoch0:', cast(doc_id as string))) AS h
        |  FROM documents ORDER BY h, doc_id LIMIT 20)
        |SELECT cast(row_number() OVER (ORDER BY h, doc_id) as bigint) AS rank,
        |       doc_id, h
        |FROM top ORDER BY rank""".stripMargin)
  }

  /** VARIANT semi-structured round-trip (Spark 4.x `parse_json` →
    * `variant_get`): deterministic JSON synthesized from orders, parsed
    * ONCE into the binary VARIANT encoding, then typed extractions
    * aggregate exactly back to the source — certifying parse + path
    * extraction + cast against the relational oracle (which reads the
    * same source directly, the established round-trip trick). VARIANT
    * keeps extraction scan-side and codegen'd; no per-row re-parse per
    * path the way repeated `get_json_object` calls would.
    */
  private def qVariant(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """WITH j AS (
        |  SELECT parse_json(concat('{"k":', cast(o_orderkey as string),
        |           ',"p":"', o_orderpriority, '","t":',
        |           cast(cast(floor(o_totalprice * 100) as bigint) as string),
        |           '}')) AS v
        |  FROM orders)
        |SELECT cast(variant_get(v, '$.p') as string) AS pri, count(*) AS n,
        |       sum(cast(variant_get(v, '$.t') as bigint)) AS sum_c,
        |       max(cast(variant_get(v, '$.k') as bigint)) AS max_k
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** XML extraction (Spark 4.x built-in `from_xml` with a DECLARED
    * schema): deterministic XML synthesized from orders, parsed back to a
    * typed struct and aggregated to the source values — the same
    * round-trip certification as qVariant/the log source. Parse once to
    * a struct, project native fields; never per-field xpath calls.
    */
  private def qXmlExtract(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """WITH x AS (
        |  SELECT from_xml(concat('<o><k>', cast(o_orderkey as string),
        |           '</k><s>', o_orderstatus, '</s><c>',
        |           cast(cast(floor(o_totalprice * 100) as bigint) as string),
        |           '</c></o>'), 'k BIGINT, s STRING, c BIGINT') AS r
        |  FROM orders)
        |SELECT r.s AS status, count(*) AS n, cast(sum(r.c) as bigint) AS sum_c
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** LISTAGG ordered string aggregation (Spark 4.x `WITHIN GROUP`): the
    * first three orderkeys per priority concatenated in declared order —
    * deterministic because the WITHIN GROUP order is total and the input
    * is pre-limited per group by a rank filter (compiled to
    * WindowGroupLimit, so no group ever aggregates more than 3 strings).
    */
  private def qListagg(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """WITH top3 AS (
        |  SELECT o_orderpriority, o_orderkey,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_orderpriority AS pri,
        |       listagg(cast(o_orderkey as string), ',')
        |         WITHIN GROUP (ORDER BY o_orderkey) AS first_keys
        |FROM top3 WHERE rn <= 3 GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Bitwise aggregates (bit_or / bit_and / bit_xor): exact integer bit
    * accumulation per group — the compact-bitmap building block (presence
    * masks, feature flags) that stays a one-pass map-side-combinable
    * hash aggregate at any scale.
    */
  private def qBitAgg(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderstatus AS status,
        |       cast(bit_or(o_orderkey % 4096) as bigint) AS b_or,
        |       cast(bit_and(o_orderkey % 4096 + 4096) as bigint) AS b_and,
        |       cast(bit_xor(o_orderkey) as bigint) AS b_xor
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Curriculum-mixing schedule ([[Sampling.curriculumOrder]]): a
    * deterministic virtual-time order that interleaves sources
    * proportionally to weight at every prefix — the data-mixture schedule
    * a trainer consumes, with nothing sampled away. Weight here derives
    * from the source id (`suffix % 3 + 1`) so both engines compute it;
    * readout takes the schedule head via TakeOrdered and aggregates per
    * source, making the 3:1 interleave a hash-checked fact.
    */
  private def qCurriculum(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select("doc_id", "source")
    val w = expr("cast(substring(source, 4) as int) % 3 + 1").cast("long")
    Sampling.curriculumOrder(docs, "doc_id", w, 17L)
      .orderBy(col("__vtime"), col("doc_id")).limit(300)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), min("__vtime").as("min_v"),
        max("__vtime").as("max_v"))
      .orderBy("source")
  }

  /** Array set operations (array_union / array_intersect / array_except)
    * over per-group collected sets — readout is SIZES only, so the result
    * is element-order-insensitive and the DuckDB oracle can rebuild the
    * same sets with list functions. Per-group arrays are bounded (≤100
    * distinct residues), the collect is an ObjectHashAggregate.
    */
  private def qArraySetops(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """WITH a AS (
        |  SELECT o_orderpriority AS pri,
        |         sort_array(collect_set(o_orderkey % 100)) AS sa
        |  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
        |b AS (
        |  SELECT o_orderpriority AS pri,
        |         sort_array(collect_set(o_orderkey % 100)) AS sb
        |  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
        |SELECT a.pri,
        |       cast(size(array_union(sa, sb)) as bigint) AS n_union,
        |       cast(size(array_intersect(sa, sb)) as bigint) AS n_intersect,
        |       cast(size(array_except(sa, sb)) as bigint) AS n_except
        |FROM a JOIN b ON a.pri = b.pri ORDER BY a.pri""".stripMargin)
  }

  /** Map construction round-trip (map_from_entries → size / element_at /
    * map_keys): per-priority status→count map built from a sorted entry
    * list (deterministic key order), read back and certified against the
    * relational source the same way qVariant/qXmlExtract round-trip.
    */
  private def qMapFuncs(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """WITH c AS (
        |  SELECT o_orderpriority AS pri, o_orderstatus AS st, count(*) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |m AS (
        |  SELECT pri,
        |         map_from_entries(sort_array(collect_list(struct(st, cnt)))) AS mp
        |  FROM c GROUP BY 1)
        |SELECT pri, cast(size(mp) as bigint) AS n_keys,
        |       cast(element_at(mp, 'F') as bigint) AS n_f,
        |       map_keys(mp)[0] AS first_key
        |FROM m ORDER BY pri""".stripMargin)
  }

  /** EXISTS / NOT EXISTS subqueries (the SQL spelling of semi/anti —
    * Catalyst plans them as LeftSemi/LeftAnti, the only scalable shape):
    * customers with an urgent order but no 1996 order, counted per
    * segment. Identical text runs in DuckDB.
    */
  private def qExistsSubq(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("customer")
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderdate >= timestamp '1996-01-01 00:00:00'
        |                    AND o2.o_orderdate <  timestamp '1997-01-01 00:00:00')
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** RANGE-frame windows (value-based frames, not row-counted ones): each
    * order's trailing-30-day spend per customer — frame bounds in exact
    * integer MICROSECONDS over the epoch so both engines cut the frame
    * identically. Readout keeps order-independent per-priority extremes.
    */
  private def qWindowRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("us"))
      .rangeBetween(-2592000000000L, 0L) // 30 days of microseconds
    t(spark, dir, "orders")
      .withColumn("us", unix_micros(col("o_orderdate").cast("timestamp")))
      .withColumn("pc", floor(col("o_totalprice") * 100).cast("long"))
      .withColumn("trail30", sum("pc").over(w))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), max("trail30").as("max_trail30_c"),
        min("trail30").as("min_trail30_c"))
      .orderBy("o_orderpriority")
  }

  /** Join-size estimation WITHOUT running the join — the planning probe
    * next to [[qSkewReport]]: `|A ⋈ B| = Σ_k cntA(k)·cntB(k)` from the
    * two per-key count aggregates, whose join is keys-sized (≪ the
    * join's row output, and never materializes a single joined row).
    * Also reports both input sizes and the max single-key contribution —
    * the row that tells you whether ONE hot key dominates the output.
    */
  private def qJoinSizeEst(spark: SparkSession, dir: String): DataFrame = {
    val a = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("ca"))
    val b = t(spark, dir, "orders")
      .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("cb"))
    a.join(b, "k")
      .select((col("ca") * col("cb")).as("contrib"), col("ca"), col("cb"))
      .agg(sum("contrib").as("est_rows"),
        count(lit(1)).as("n_shared_keys"),
        max("contrib").as("max_key_rows"),
        sum("ca").as("a_rows_on_shared"), sum("cb").as("b_rows_on_shared"))
  }

  /** Join-key skew report — the profiling pass that decides whether a
    * join needs salting ([[graft.ops.SkewJoin]]): per-key frequencies of
    * the orders⋈customer key, the 5 heaviest keys (deterministic
    * tie-break on the key), and the skew factor
    * `max·n_keys·1e6 div total` (1e6 = perfectly uniform). The top-5 is
    * `orderBy.limit` — TakeOrdered's per-partition partial top-k, never
    * a global sort.
    */
  private def qSkewReport(spark: SparkSession, dir: String): DataFrame = {
    val cnt = t(spark, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    val summary = cnt.agg(count(lit(1)).as("n_keys"), sum("cnt").as("total"),
      max("cnt").as("max_cnt"))
    cnt.orderBy(col("cnt").desc, col("o_custkey")).limit(5)
      .crossJoin(broadcast(summary))
      .select(col("o_custkey"), col("cnt"), col("n_keys"),
        expr("max_cnt * n_keys * 1000000 div total").as("skew_ppm"))
      .orderBy(col("cnt").desc, col("o_custkey"))
  }

  /** Unigram-LM KL divergence between two corpus slices — the drift /
    * domain-shift measurement next to [[Dsir]]'s importance weights.
    * Add-1 smoothing over the JOINT vocabulary; every term is the exact
    * integer `(cₐ+1)·(sln((cₐ+1)·(N_b+V)) − sln((c_b+1)·(Nₐ+V)))` with
    * the repo's [[graft.functions.ScaledLn]] formula, long-summed — so
    * the scaled KL (units: 1e-6 nat · (Nₐ+V)) is bit-exact
    * cross-engine. One tokenize + one hash aggregate + a 1-row totals
    * broadcast; both directions reported.
    */
  private def qKlSources(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ScaledLn
    val tok = spread(t(spark, dir, "documents"))
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), explode(TF.tokenHashes(col("text"))).as("th"))
    val byTok = tok.groupBy("th").agg(
      sum(when(col("source") === "src0", 1L).otherwise(0L)).as("ca"),
      sum(when(col("source") === "src1", 1L).otherwise(0L)).as("cb"))
    val totals = byTok.agg(sum("ca").as("na"), sum("cb").as("nb"),
      count(lit(1)).as("v"))
    byTok.crossJoin(broadcast(totals))
      .select(col("na"), col("nb"), col("v"),
        ((col("ca") + 1) *
          (ScaledLn.column((col("ca") + 1) * (col("nb") + col("v"))) -
           ScaledLn.column((col("cb") + 1) * (col("na") + col("v")))))
          .as("t_ab"),
        ((col("cb") + 1) *
          (ScaledLn.column((col("cb") + 1) * (col("na") + col("v"))) -
           ScaledLn.column((col("ca") + 1) * (col("nb") + col("v")))))
          .as("t_ba"))
      .groupBy("na", "nb", "v")
      .agg(sum("t_ab").as("kl_ab_u"), sum("t_ba").as("kl_ba_u"))
  }

  private def qLangId(spark: SparkSession, dir: String): DataFrame =
    spread(t(spark, dir, "documents"))
      .groupBy(TF.langId(col("text")).as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy("pred_lang")

  private def qQuality(spark: SparkSession, dir: String): DataFrame =
    spread(t(spark, dir, "documents"))
      .groupBy(TF.qualityScore(col("text")).as("score"))
      .agg(count(lit(1)).as("n"))
      .orderBy("score")

  private def qTokenStats(spark: SparkSession, dir: String): DataFrame =
    spread(t(spark, dir, "documents"))
      .groupBy("source")
      .agg(
        sum(TF.tokenCount(col("text")).cast("long")).as("sum_tokens"),
        sum(TF.bpeishTokenCount(col("text")).cast("long")).as("sum_bpe"),
        r(avg(col("n_chars")), 2).as("avg_chars"))
      .orderBy("source")

  private def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.attachBinary(t(spark, dir, "documents"), "text")
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(col("media_meta.n_bytes").cast("long")).as("total_bytes"),
        countDistinct(col("media_meta.sha256")).as("n_distinct_content"))
      .orderBy("source")

  /** Multimodal image features from REAL decoded pixels
    * (`javax.imageio`, in-JDK): each document row becomes a
    * deterministic synthetic PNG — channel values are modular arithmetic
    * on (doc_id, x, y) ([[Multimodal.syntheticPng]]) — except every 10th
    * row, which carries a TRUNCATED PNG (valid magic, torn body) to
    * exercise the corrupt-payload row-error path. PNG is lossless and
    * the decode statistics are exact longs, so the oracle recomputes
    * every figure as pure integer arithmetic in SQL with no image
    * library; `blocks_exact` asserts the 2x2 block-sum feature grid
    * partitions the image's total gray mass (the resize/feature-grid
    * machinery), which must hold bit-exactly on every decoded row.
    */
  private def qMultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = spread(t(spark, dir, "documents"))
      .select(col("doc_id")).as[Long]
      .map(Multimodal.pngFixture).toDF() // torn-rule + dims shared with ScaleCurve
    Multimodal.decodeImageFeatures(spark, media, gridW = 2, gridH = 2).toDF()
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("status") === "ok", 1L).otherwise(0L)).as("n_ok"),
        sum(when(col("status") =!= "ok", 1L).otherwise(0L)).as("n_err"),
        sum(col("width").cast("long")).as("sum_w"),
        sum(col("height").cast("long")).as("sum_h"),
        sum(when(col("channels") === 3, 1L).otherwise(0L)).as("n_rgb"),
        sum(col("gray_sum")).as("total_gray"),
        sum(col("n_pixels")).as("total_pix"),
        r(sum(col("gray_sum")) / (lit(765.0) * sum(col("n_pixels"))), 6)
          .as("mean_luma"),
        expr("bool_and(aggregate(block_sums, 0L, (a, x) -> a + x) = gray_sum)")
          .as("blocks_exact"))
  }

  /** Multimodal audio features from REAL decoded PCM samples
    * (`javax.sound.sampled`, in-JDK): each document row becomes a
    * deterministic synthetic 16-bit WAV — sample values are modular
    * arithmetic on (doc_id, frame, channel)
    * ([[Multimodal.syntheticWav]]) — except every 10th row, which
    * carries a TRUNCATED WAV (RIFF magic intact, torn header) to
    * exercise the corrupt-payload row-error path. PCM is lossless and
    * the decode statistics are exact longs, so the oracle recomputes
    * every figure as pure integer arithmetic in SQL with no audio
    * library; `hist_exact` asserts the 8-bucket energy histogram
    * partitions the sample count (the histogram machinery), which must
    * hold bit-exactly on every decoded row, and `hist_lo`/`hist_hi`
    * check two buckets value-for-value.
    */
  private def qAudioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = spread(t(spark, dir, "documents"))
      .select(col("doc_id")).as[Long]
      .map(Multimodal.wavFixture).toDF() // torn-rule + shape shared with ScaleCurve
    Multimodal.decodeAudioFeatures(spark, media).toDF()
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("status") === "ok", 1L).otherwise(0L)).as("n_ok"),
        sum(when(col("status") =!= "ok", 1L).otherwise(0L)).as("n_err"),
        sum(col("sample_rate").cast("long")).as("sum_rate"),
        sum(col("channels").cast("long")).as("sum_channels"),
        sum(col("n_frames")).as("total_frames"),
        sum(col("n_samples")).as("total_samples"),
        max(col("peak_abs")).as("max_peak"),
        sum(col("sum_abs")).as("total_abs"),
        sum(col("sum_sq")).as("total_sq"),
        r(sum(col("sum_abs")) / (lit(32768.0) * sum(col("n_samples"))), 6)
          .as("mean_level"),
        expr("bool_and(aggregate(energy_hist, 0L, (a, x) -> a + x) = n_samples)")
          .as("hist_exact"),
        sum(coalesce(try_element_at(col("energy_hist"), lit(1)), lit(0L)))
          .as("hist_lo"),
        sum(coalesce(try_element_at(col("energy_hist"), lit(8)), lit(0L)))
          .as("hist_hi"))
  }

  /** REAL video-container frame sampling ([[Multimodal
    * .decodeMediaFrames]], `javax.imageio` multi-image readers —
    * in-JDK): each document row becomes a deterministic synthetic
    * animated GIF — 3-8 full grayscale frames whose pixel at
    * (frame, x, y) is modular arithmetic on (doc_id, f, x, y)
    * ([[Multimodal.syntheticGif]]; ≤256 colors per frame, so the
    * palette is lossless) — except every 10th row, which carries a
    * TRUNCATED GIF (magic intact, torn) for the row-error path. The
    * operator counts TRUE container frames, samples 4 evenly
    * (`idx = f·n/4`, the arithmetic `sample_exact` pins alongside
    * `n_sampled = least(4, n_frames)`), and reduces each sampled frame
    * to its exact gray mass; the oracle reproduces frame counts,
    * sampled indexes, and per-frame masses as pure integer SQL.
    */
  private def qVideoFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = spread(t(spark, dir, "documents"))
      .select(col("doc_id")).as[Long]
      .map(Multimodal.gifFixture).toDF() // torn-rule + shape shared with ScaleCurve
    Multimodal.decodeMediaFrameFeatures(spark, media, nSample = 4).toDF()
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("status") === "ok", 1L).otherwise(0L)).as("n_ok"),
        sum(when(col("status") =!= "ok", 1L).otherwise(0L)).as("n_err"),
        sum(col("width").cast("long")).as("sum_w"),
        sum(col("height").cast("long")).as("sum_h"),
        sum(col("n_frames").cast("long")).as("total_frames"),
        sum(col("n_sampled").cast("long")).as("total_sampled"),
        sum(expr("aggregate(frame_gray, 0L, (a, x) -> a + x)")).as("total_gray"),
        sum(expr("aggregate(frame_idx, 0L, (a, x) -> a + cast(x as long))"))
          .as("idx_sum"),
        expr("bool_and(size(frame_gray) = n_sampled AND size(frame_idx) = n_sampled)")
          .as("shape_exact"),
        expr("bool_and(status <> 'ok' OR n_sampled = least(4, n_frames))")
          .as("sample_exact"))
  }

  /** Byte-range frame sampling through the `mapPartitions` plumbing
    * (the compressed-video STUB domain — GIF/TIFF containers have the
    * REAL path, [[qVideoFrames]]): 4 evenly spaced byte-range "frames"
    * per payload. Offsets/lengths are integer arithmetic and the
    * per-frame digest is sha256 over the byte range — documents are
    * ASCII, so the oracle reproduces every column (including digests)
    * in SQL.
    */
  private def qMultimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.attachBinary(spread(t(spark, dir, "documents")), "text")
      .select(col("doc_id").as("id"), col("content"))
    Multimodal.sampleFrames(spark, media, nFrames = 4).toDF()
      .agg(count(lit(1)).as("n_frames"),
        sum(col("length").cast("long")).as("total_len"),
        countDistinct(col("sha8")).as("n_digests"))
  }

  /** Capstone: the end-to-end training-data pipeline shape — quality
    * filter, then exact dedup (keep min doc_id per normalized-text
    * fingerprint), then per-language corpus stats. Every stage is the
    * declarative operator used elsewhere; the oracle reproduces the whole
    * chain in SQL.
    */
  private def qPipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(t(spark, dir, "documents"))
      .filter(TF.qualityScore(col("text")) >= 0.75)
    val w = Window.partitionBy(TF.contentFingerprint(col("text")))
      .orderBy(col("doc_id").asc)
    docs
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(TF.tokenCount(col("text")).cast("long")).as("n_tokens"),
        r(avg(TF.tokenCount(col("text"))), 2).as("avg_tokens"))
      .orderBy("lang")
  }

  /** The full pretraining-data chain as ONE oracle-verified plan —
    * quality gate → exact dedup (keep min id per content fingerprint) →
    * eval-set decontamination ([[graft.ops.Decontaminate]], 8-gram
    * overlap, eval = doc_id < 20 of the raw corpus, eval ids excluded
    * from train) → deterministic curriculum schedule
    * ([[Sampling.curriculumOrder]]) → schedule-head readout. Every stage
    * is the same operator the standalone queries certify; chaining them
    * proves the composition (filters feeding window dedup feeding an
    * anti-join feeding the schedule) stays one declarative plan the
    * optimizer can see through — no materialization boundaries except
    * the broadcast eval side. DuckDB reproduces the whole chain.
    */
  private def qPipelinePretrain(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(t(spark, dir, "documents"))
    val quality = docs.filter(TF.qualityScore(col("text")) >= 0.75)
    val w = Window.partitionBy(TF.contentFingerprint(col("text")))
      .orderBy(col("doc_id").asc)
    val deduped = quality.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val contam = graft.ops.Decontaminate.contaminated(
      deduped, t(spark, dir, "documents").filter(col("doc_id") < 20),
      "doc_id", "text", 8)
    val train = deduped.filter(col("doc_id") >= 20)
      .join(contam, Seq("doc_id"), "left_anti")
    Sampling.curriculumOrder(
        train.select("doc_id", "source", "lang", "text"), "doc_id",
        expr("cast(substring(source, 4) as int) % 3 + 1").cast("long"), 29L)
      .orderBy(col("__vtime"), col("doc_id")).limit(200)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(TF.tokenCount(col("text")).cast("long")).as("n_tokens"))
      .orderBy("lang")
  }

  /** ListState sliding window ([[graft.streaming.RecentValues]]): each
    * user's last-3 event values by (ts, event_id) maintained in LIST
    * state; the final window per user is selected by max cumulative
    * count (`max_by` — monotonic per touched batch), which the oracle
    * reproduces as a plain rank-3 window over the batch table.
    */
  private def qListState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val srcDir = streamChunksDir(spark, dir)
    val base = s"/tmp/graft_liststate/${tmpKey(dir)}"
    deleteRec(new java.io.File(base))
    val sink = s"$base/sink"
    withRocksDbStateStore(spark) {
      // 2 data batches, not 8 — the q_transform_state batch-count
      // rationale; RecentValues sorts each batch to the (ts, event_id)
      // total order and the readout arg-maxes on the monotonic nSeen, so
      // the final window is batching-invariant (time-ordered chunks)
      val stream = spark.readStream
        .schema("event_id LONG, event_type STRING, user_id LONG, ts TIMESTAMP, value DOUBLE")
        .option("maxFilesPerTrigger", 4)
        .parquet(srcDir)
        .select(col("user_id").as("userId"), col("event_id").as("eventId"),
          unix_micros(col("ts")).as("tsUs"),
          floor(col("value") * 100).cast("long").as("cents"))
        .as[graft.streaming.RecentValues.In]
      drainAppendToParquet(graft.streaming.RecentValues(stream).toDF(),
        sink, "q_list_state", statePartitionCap = Some(2))
    }
    spark.read.parquet(sink)
      .groupBy(col("userId").as("user_id"))
      .agg(max_by(col("sum3"), col("nSeen")).as("sum3_cents"),
        max_by(col("n3"), col("nSeen")).cast("long").as("n3"))
      .orderBy("user_id")
  }

  /** Gap sessionization on the `transformWithState` TIMER surface
    * ([[graft.streaming.TimedSessions]]): same 30-minute-gap semantics as
    * q_sessionize_custom's legacy-API implementation, so the two share
    * one oracle — the strongest statement that the timer rewrite changed
    * the API, not the sessions. Requires the RocksDB state store
    * (transformWithState contract), swapped in scoped like
    * q_transform_state.
    */
  private def qTimedSessions(spark: SparkSession, dir: String): DataFrame = {
    val srcDir = streamChunksDir(spark, dir)
    val sinkDir = s"/tmp/graft_timed_sessions_sink/${tmpKey(dir)}"
    deleteRec(new java.io.File(sinkDir))
    val schema = spark.read.parquet(srcDir).schema
    import spark.implicits._
    withRocksDbStateStore(spark) {
      val ev = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4") // sessions span batches
        .parquet(srcDir)
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("userId"), col("ts"))
        .as[graft.streaming.TimedSessions.Event]
      val sessions =
        graft.streaming.TimedSessions(ev, gapMillis = 30 * 60 * 1000L)
      drainAppendToParquet(sessions.toDF(), sinkDir, "q_timed_sessions",
        statePartitionCap = Some(2))
    }
    readSinkOrEmpty(spark, sinkDir,
      "userId BIGINT, start TIMESTAMP, end TIMESTAMP, nEvents INT")
      .groupBy(col("userId").as("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("nEvents").cast("long")).as("n_events"),
        max(col("nEvents").cast("long")).as("max_session_events"))
      .orderBy("user_id")
  }

  /** Gopher-style repetition filter stats per source. */
  private def qRepetition(spark: SparkSession, dir: String): DataFrame =
    spread(t(spark, dir, "documents"))
      .groupBy("source")
      .agg(r(avg(TF.repetitionRatio(col("text"))), 4).as("avg_rep"),
        count(when(TF.repetitionRatio(col("text")) > 0.2, 1)).as("n_repetitive"))
      .orderBy("source")

  /** PII redaction end-to-end: inject a deterministic email+phone into
    * every 10th doc, redact, and verify the redaction removed all of them.
    * Injection happens in-query so the oracle reproduces the whole chain
    * (the base corpus carries no PII of its own).
    */
  private def qPiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val injected = spread(t(spark, dir, "documents"))
      .withColumn("text2",
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or call +1 555 123 4567")))
          .otherwise(col("text")))
    injected
      // redact ONCE per row; three aggregate branches over the same column
      // would each re-run the chained regex replaces
      .withColumn("__red", TF.redactPii(col("text2")))
      .agg(
        count(when(col("text2").rlike(TF.EmailRegex), 1)).as("n_docs_with_pii"),
        count(when(col("__red").rlike(TF.EmailRegex)
          || col("__red").rlike(TF.PhoneRegex), 1)).as("n_after_redact"),
        sum((length(col("text2")) - length(col("__red"))).cast("long"))
          .as("chars_removed"))
  }

  /** Benchmark decontamination: corpus docs sharing an 8-token shingle with
    * the doc_id<20 "eval set"; oracle reproduces the shingle-overlap join.
    */
  private def qDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.ops.Decontaminate.contaminated(
        spread(docs), docs.filter(col("doc_id") < 20), "doc_id", "text", 8)
      .agg(count(lit(1)).as("n_contaminated"),
        coalesce(sum("doc_id"), lit(0L)).as("sum_ids"))
  }

  private def qTfidfTop(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TfIdf.topTermsPerGroup(
      t(spark, dir, "documents"), "doc_id", "text", "lang", 5)
      .orderBy("lang", "rank")

  /** Winnowing-fingerprint dedup, oracle-checked: append exact copies of
    * every 5th doc under shifted ids — identical text MUST produce an
    * identical rolling fingerprint, so the fp-blocked pair join (never
    * all-pairs) followed by a text-equality verify finds every copy. The
    * oracle reproduces the exact-duplicate pair count by joining on text
    * directly; near-dup fp collisions are pruned by the verify stage.
    */
  private def qRollingFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val docs = base.unionByName(
      base.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L)))
    val fp = spread(docs).select(col("doc_id"), col("text"),
      RollingHashFingerprint(col("text"), 16).as("__fp"))
    fp.as("a")
      .join(fp.as("b"),
        col("a.__fp") === col("b.__fp") && col("a.doc_id") < col("b.doc_id"))
      .filter(col("a.text") === col("b.text"))
      .agg(count(lit(1)).as("n_exact_dup_pairs"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
  }

  /** Sequence packing ([[graft.ops.Packing]]): documents laid end-to-end
    * in doc_id order and cut into 512-token context windows via the
    * two-pass distributed prefix sum — no single-partition global window
    * anywhere in the plan (PlanSpec asserts it). Output per window: doc
    * count, token count, boundary crossings (the packing-quality metric),
    * and the window's first global token offset; the oracle reproduces the
    * offsets with a plain SQL window cumsum, which DuckDB can afford
    * single-threaded at oracle scale.
    */
  private def qSeqPack(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(t(spark, dir, "documents"))
      .select(col("doc_id"), TF.tokenCount(col("text")).cast("long").as("tokens"))
    val (packed, release) = Packing.packBins(docs, "doc_id", "tokens", 512L)
    val agg = packed
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("tokens").as("bin_tokens"),
        sum("crosses").as("n_crossing"),
        min("cum_excl").as("first_offset"))
      .orderBy("bin")
    // per-bin result is small: materialize eagerly, release the sort cache
    val out = agg.localCheckpoint(true)
    release()
    out
  }

  /** Overlapping token-window chunking ([[graft.ops.Chunking]]): 32-token
    * windows, stride 24 (8-token overlap), RAG/long-doc prep. Per-language
    * chunk counts plus a content check (distinct chunk texts) so the
    * oracle verifies the actual window contents, not just their number.
    */
  private def qChunkSplit(spark: SparkSession, dir: String): DataFrame =
    Chunking.chunkTokens(spread(t(spark, dir, "documents")), "text", 32, 24)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_chunks"),
        sum(size(col("chunk_tokens")).cast("long")).as("sum_chunk_tokens"),
        sum(when(size(col("chunk_tokens")) === 32, 1L).otherwise(0L)).as("n_full"),
        // distinct over the 8-byte hash, not the ~200-byte text: same count
        // (collisions negligible), 25x less shuffle
        countDistinct(xxhash64(col("chunk_text"))).as("n_distinct_chunks"))
      .orderBy("lang")

  /** CCNet-style PARAGRAPH dedup readout: documents split into
    * non-overlapping 32-token windows ("paragraphs" — the corpus has no
    * newline structure), and only the corpus-wide FIRST occurrence
    * (min (doc_id, chunk_idx), encoded as one sortable long) of each
    * identical window is kept. Planted evidence: every 7th doc re-enters
    * as an exact copy under id + 2e6, so all its windows are drops.
    * Scale shape: one chunk pass, one hash aggregate on 8-byte window
    * hashes, one join on the same key (exchange reused) — the window
    * HASH stands in for the text on every shuffle (collisions
    * negligible, the q_chunk_split trade); the oracle groups by the
    * window text itself.
    */
  private def qParagraphDedup(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "documents").select("doc_id", "lang", "text")
    val docs = base.unionByName(
      base.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + lit(2000000L)))
    // the chunk pass feeds the first-occurrence aggregate AND the join
    // probe: persist the narrow (lang, ik, h, nt) rows so tokenize+chunk
    // runs once (the shared-explode discipline of qCommonNgrams)
    val chunks = Chunking.chunkTokens(spread(docs), "text", 32, 32)
      .select(col("lang"),
        (col("doc_id") * 1000000L + col("chunk_idx")).as("__ik"),
        xxhash64(col("chunk_text")).as("__h"),
        size(col("chunk_tokens")).cast("long").as("__nt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val first = chunks.groupBy("__h").agg(min("__ik").as("__fk"))
    val agg = chunks.join(first, Seq("__h"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__ik") === col("__fk"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__ik") === col("__fk"), col("__nt")).otherwise(0L)).as("kept_tokens"))
      .orderBy("lang")
    val out = agg.localCheckpoint(true)
    chunks.unpersist(blocking = false)
    out
  }

  /** Corpus-level boilerplate scrubbing ([[graft.ops.Boilerplate]]): word
    * 3-grams in >=1% of documents are "common"; each doc's boilerplate
    * share = common fraction of its distinct 3-grams. Shares cross engines
    * as scaled longs via the floor-round formula (`r`'s rationale). Docs
    * with zero 3-grams (< 3 tokens) are excluded on both sides.
    */
  private def qCommonNgrams(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(t(spark, dir, "documents"))
    // the hashed scale path: one persisted explode of 64-bit gram keys
    // (PipelineOpsSpec pins its equivalence to the string-gram path)
    val (shares, release) = Boilerplate.hashedBoilerplateShares(
      docs, "doc_id", "text", 3, 0.01, carryCols = Seq("lang"))
    val agg = shares
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_common") * lit(1.0) / col("n_grams") >= 0.1, 1L)
          .otherwise(0L)).as("n_flagged"),
        sum(floor(col("n_common") * lit(1e6) / col("n_grams") + 0.5).cast("long"))
          .as("sum_scaled_share"))
      .orderBy("lang")
    // 5-row result: materialize eagerly so the persisted pairs release now
    val out = agg.localCheckpoint(true)
    release()
    out
  }

  /** Int8 embedding quantization ([[graft.functions.VectorFunctions]]
    * int8Scale/quantizeInt8/int8SqError): per-vector symmetric scale,
    * cross-engine floor-round codes, reconstruction error aggregated per
    * label as scaled-long sums (double SUMS across rows are
    * partition-order dependent; scaled longs are exact and associative).
    * Saturation count doubles as a codes-range invariant: the max element
    * of every nonzero vector quantizes to exactly +-127.
    */
  private def qEmbedQuantize(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions._
    val maxAbsCode = aggregate(col("q"), lit(0L), (acc, x) => greatest(acc, abs(x)))
    spread(t(spark, dir, "embeddings"))
      .select(col("vec_id"), col("label"), toDoubleArray(col("embedding")).as("v"))
      .withColumn("scale", int8Scale(col("v")))
      .withColumn("q", quantizeInt8(col("v"), col("scale")))
      .withColumn("sqerr", int8SqError(col("v"), col("q"), col("scale")))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("sqerr") * lit(1e12) + 0.5).cast("long")).as("sum_scaled_sqerr"),
        max(maxAbsCode).as("max_abs_code"),
        sum(when(maxAbsCode === 127L, 1L).otherwise(0L)).as("n_saturated"))
      .orderBy("label")
  }

  /** Embedding ingest prep ([[graft.functions.L2Normalize]]): the
    * matryoshka pipeline — normalize the 64-dim embedding, truncate to
    * the leading 32 dims, renormalize, int8-quantize. The sqnorm readout
    * proves unit normalization (1e12-scaled squared norms); the rest is
    * the q_embed_quantize error readout on the prepped vectors. Every
    * fold is sequential and scaled per row, so the oracle reproduces all
    * of it bit-for-bit.
    */
  private def qEmbedPrep(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions._
    val maxAbsCode = aggregate(col("q"), lit(0L), (acc, x) => greatest(acc, abs(x)))
    spread(t(spark, dir, "embeddings"))
      .select(col("vec_id"), col("label"), toDoubleArray(col("embedding")).as("v"))
      .withColumn("m", graft.functions.L2Normalize(
        slice(graft.functions.L2Normalize(col("v")), 1, 32)))
      .withColumn("scale", int8Scale(col("m")))
      .withColumn("q", quantizeInt8(col("m"), col("scale")))
      .withColumn("sqerr", int8SqError(col("m"), col("q"), col("scale")))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("sqerr") * lit(1e12) + 0.5).cast("long")).as("sum_scaled_sqerr"),
        max(maxAbsCode).as("max_abs_code"),
        sum(when(maxAbsCode === 127L, 1L).otherwise(0L)).as("n_saturated"),
        sum(floor(aggregate(col("m"), lit(0.0), (a, x) => a + x * x) * lit(1e12) + 0.5)
          .cast("long")).as("sum_scaled_sqnorm"))
      .orderBy("label")
  }

  /** In-corpus unigram-LM scoring ([[graft.ops.NgramLm]]): the CCNet-style
    * perplexity filter. Integer scaled-long log-likelihoods end to end —
    * see the op scaladoc for why no raw double is ever summed across rows.
    * The keep threshold (mean scaled logprob per token > -3.401) sits
    * between the corpus p10 and p90, so the flag actually discriminates.
    */
  private def qUnigramLm(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(t(spark, dir, "documents"))
    val (scores, release) = NgramLm.unigramScores(
      docs, "doc_id", "text", carryCols = Seq("lang"))
    val agg = scores
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("scaled_logprob").as("sum_scaled_lp"),
        sum(when(col("scaled_logprob") > lit(-3401000L) * col("n_tokens"), 1L)
          .otherwise(0L)).as("n_kept"))
      .orderBy("lang")
    val out = agg.localCheckpoint(true)
    release()
    out
  }

  /** Conditional bigram-LM scoring ([[graft.ops.NgramLm.bigramScores]]) —
    * the chain-probability step up from [[qUnigramLm]]; threshold between
    * corpus p10/p90 like the unigram one.
    */
  private def qBigramLm(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(t(spark, dir, "documents"))
    val (scores, release) = NgramLm.bigramScores(
      docs, "doc_id", "text", carryCols = Seq("lang"))
    val agg = scores
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("scaled_logprob").as("sum_scaled_lp"),
        sum(when(col("scaled_logprob") > lit(-3410000L) * col("n_bigrams"), 1L)
          .otherwise(0L)).as("n_kept"))
      .orderBy("lang")
    val out = agg.localCheckpoint(true)
    release()
    out
  }

  /** CCNet perplexity buckets ([[graft.ops.NgramLm.pplBuckets]], exact
    * mode): per language, documents split into head/middle/tail thirds by
    * per-token unigram log-likelihood — the published CCNet step after LM
    * scoring. The sort key is one long/long double division (bit-identical
    * cross-engine) with doc_id tiebreak, so DuckDB's ntile reproduces the
    * assignment exactly. The approx (sketch-threshold) scale mode is
    * invariant-checked in PipelineOpsSpec instead.
    */
  private def qPplBuckets(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(t(spark, dir, "documents"))
    val (scores, release) = NgramLm.unigramScores(
      docs, "doc_id", "text", carryCols = Seq("lang"))
    val bucketed = NgramLm.pplBuckets(
      scores, partitionCols = Seq("lang"), idCol = "doc_id", buckets = 3,
      exact = true)
    val agg = bucketed
      .withColumn("bucket",
        when(col("ppl_bucket") === 1, "head")
          .when(col("ppl_bucket") === 2, "middle").otherwise("tail"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        sum("scaled_logprob").as("sum_scaled_lp"),
        min("doc_id").as("min_doc"))
      .orderBy("lang", "bucket")
    val out = agg.localCheckpoint(true)
    release()
    out
  }

  /** External-LM scoring ([[graft.ops.NgramLm.unigramScoresWithVocab]]):
    * the real CCNet shape — vocabulary estimated on one slice (even ids:
    * "train on A"), documents of the OTHER slice scored against it
    * ("score B"), instead of the corpus scoring itself ([[qUnigramLm]]).
    * OOV tokens price as count-1 (scaled score 0) and are counted, so
    * the oracle checks the OOV path too. Same integer scaled-long
    * arithmetic end to end.
    */
  private def qExternalLm(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(t(spark, dir, "documents"))
    val vocab = NgramLm.tokenVocabulary(docs.filter(col("doc_id") % 2 === 0), "text")
    val (scores, release) = NgramLm.unigramScoresWithVocab(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", vocab,
      carryCols = Seq("lang"))
    val agg = scores
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("scaled_logprob").as("sum_scaled_lp"),
        sum("n_oov").as("sum_oov"),
        sum(when(col("n_oov") > 0, 1L).otherwise(0L)).as("n_with_oov"))
      .orderBy("lang")
    val out = agg.localCheckpoint(true)
    release()
    out
  }

  /** DSIR importance resampling ([[graft.ops.Dsir]]): the published
    * data-selection shape — a target LM (English slice 0: "what we want
    * more of") and a raw LM (slice 1: "what we are selecting from") are
    * estimated once, candidates (slice 2) are weighted by the scaled
    * integer `Σ ln p_target − ln p_raw`, and the top-50 by (weight,
    * doc_id) are kept. Row-for-row oracle: the selected SET, weights,
    * and OOV counts must all reproduce exactly.
    */
  private def qDsir(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(t(spark, dir, "documents"))
    val target = NgramLm.tokenVocabulary(
      docs.filter(col("doc_id") % 3 === 0 && col("lang") === "en"), "text")
    val raw = NgramLm.tokenVocabulary(docs.filter(col("doc_id") % 3 === 1), "text")
    val (weights, release) = Dsir.importanceWeights(
      docs.filter(col("doc_id") % 3 === 2), "doc_id", "text", target, raw,
      carryCols = Seq("lang"))
    val sel = Dsir.selectTopK(weights, "doc_id", 50)
      .select("doc_id", "lang", "n_tokens", "n_oov_target", "n_oov_raw",
        "scaled_weight")
    val out = sel.localCheckpoint(true)
    release()
    out
  }

  /** C4-style page cleaning ([[graft.ops.LineClean]]): the published T5
    * line+page rules. The flat synthetic corpus has no newlines or
    * punctuation, so multi-line pages are constructed deterministically
    * from it IN BOTH ENGINES (the q_url_blocklist pattern): tokens are
    * re-lined 8 per line via [[graft.functions.ChunkText]], each line
    * gets a (doc_id + line#)-cycled suffix (. ! ? none " javascript."),
    * and every 31st page gets a "lorem ipsum { x }" line — exercising
    * the terminal-punctuation, min-words, banned-line, min-lines, and
    * both banned-page rules on real data.
    */
  /** Deterministic multi-line page construction shared by the batch and
    * streaming C4 queries (and mirrored in the oracle SQL).
    */
  private def c4Pages(docs: DataFrame): DataFrame = {
    val suffixes = array(lit("."), lit("!"), lit("?"), lit(""), lit(" javascript."))
    val lines = graft.functions.ChunkText(col("text"), 8, 8)
    val page = concat(
      array_join(transform(lines, (x, i) =>
        concat(x, element_at(suffixes,
          ((col("doc_id") + i) % 5).cast("int") + 1))), "\n"),
      when(col("doc_id") % 31 === 0, lit("\nlorem ipsum { x }")).otherwise(lit("")))
    docs.select(col("doc_id"), col("lang"), page.as("text"))
  }

  /** Per-doc C4 verdicts with a streaming-sink-stable LONG schema. */
  private def c4CleanVerdicts(pages: DataFrame): DataFrame =
    graft.ops.LineClean.cleanPages(pages, "doc_id", "text",
        carryCols = Seq("lang"))
      .select(col("doc_id"), col("lang"),
        col("n_lines").cast("long").as("n_lines"),
        col("n_kept_lines").cast("long").as("n_kept_lines"),
        col("page_kept"),
        when(col("page_kept"), length(col("clean_text")).cast("long"))
          .otherwise(0L).as("clean_len"))

  private def c4CleanAgg(verdicts: DataFrame): DataFrame =
    verdicts.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("page_kept"), 1L).otherwise(0L)).as("n_pages_kept"),
        sum("n_lines").as("sum_lines"),
        sum("n_kept_lines").as("sum_kept_lines"),
        sum("clean_len").as("sum_clean_chars"))
      .orderBy("lang")

  private def qC4Clean(spark: SparkSession, dir: String): DataFrame =
    c4CleanAgg(c4CleanVerdicts(c4Pages(spread(t(spark, dir, "documents")))))

  /** Streaming C4 cleaning: [[qC4Clean]]'s rule filter is stateless, so
    * it must commute with micro-batching — the corpus arrives as
    * parquet-file micro-batches, each batch is page-built + rule-filtered
    * in `foreachBatch` (the same zero-shuffle scan shape as batch) into
    * the exactly-once sink, and the oracle is the batch oracle VERBATIM.
    */
  private def qStreamingC4(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = docsStreamSrcDir(spark, dir)
    val sinkDir = s"/tmp/graft_stream_c4_sink/${tmpKey(dir)}"
    deleteRec(new java.io.File(sinkDir))
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val ckpt = graft.Scratch.ephemeralCkptDir("graft_c4_ckpt").toString
    val q = stream.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // NO width cap here: measured 1.97 -> 2.16 s with one (r16 batch-4
        // drill) — the line-level clean pipeline is CPU-bound per batch
        graft.streaming.IdempotentParquetSink.writeBatch(
          c4CleanVerdicts(c4Pages(b)), id, sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(300000)) q.stop()
    deleteRec(new java.io.File(ckpt))
    c4CleanAgg(readSinkOrEmpty(spark, sinkDir,
      "doc_id LONG, lang STRING, n_lines LONG, n_kept_lines LONG, " +
        "page_kept BOOLEAN, clean_len LONG"))
      .localCheckpoint(true)
  }

  /** All-documents micro-batch source dir (3 files → 3 triggers). */
  private def docsStreamSrcDir(spark: SparkSession, dir: String): String = {
    val key = tmpKey(dir)
    oncePerDir(s"/tmp/graft_stream_docs_src/$key", "_OK") {
      val out = s"/tmp/graft_stream_docs_src/$key"
      deleteRec(new java.io.File(out))
      val docs = t(spark, dir, "documents").select("doc_id", "lang", "text")
      for (m <- Seq(0, 1, 2))
        docs.filter(pmod(col("doc_id"), lit(3)) === m)
          .coalesce(1).write.mode("append").parquet(out)
      new java.io.File(s"$out/_OK").createNewFile()
    }
  }

  /** fastText-style quality classifier ([[graft.ops.QualityClassifier]]):
    * the train-a-filter-on-labeled-slices shape — a Naive Bayes log-odds
    * linear model trained on the even-id slice (label: lang = 'en', a
    * deterministic stand-in for "reference corpus / not"), scoring the
    * odd-id slice. Every ln is of an integer and scaled once to a long,
    * so the oracle reproduces weights, OOV floor, prior, and doc scores
    * exactly ([[NgramLm]] discipline).
    */
  private def qQualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(t(spark, dir, "documents"))
    val model = QualityClassifier.train(
      docs.filter(col("doc_id") % 2 === 0)
        .withColumn("__label", when(col("lang") === "en", 1).otherwise(0)),
      "text", "__label")
    val scored = QualityClassifier.score(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", model,
      carryCols = Seq("lang"))
    val agg = scored
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("scaled_score").as("sum_scaled_score"),
        sum(when(col("scaled_score") > 0, 1L).otherwise(0L)).as("n_pred_positive"),
        sum("n_oov").as("sum_oov"))
      .orderBy("lang")
    val out = agg.localCheckpoint(true)
    model.release()
    out
  }

  /** Snapshot diff ([[graft.ops.SnapshotDiff.diff]]): the old snapshot is
    * derived deterministically from `documents` — ids %7=0 missing
    * (→ added), ids %5=0 carrying ` legacy`-suffixed text (→ changed),
    * plus id+2e6 ghost rows (→ removed) — and diffed against the current
    * table by content fingerprint. The oracle rebuilds both snapshots and
    * compares TEXT equality, so it also cross-checks that the fingerprint
    * is injective on the corpus.
    */
  private def qCorpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" legacy")))
          .otherwise(col("text")).as("text"))
      .unionAll(docs.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    def fp(df: DataFrame): DataFrame =
      df.select(col("doc_id"), TF.contentFingerprint(col("text")).as("fp"))
    graft.ops.SnapshotDiff.diff(fp(oldSnap), fp(docs), "doc_id", "fp")
      .groupBy("status")
      .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
        max("doc_id").as("max_id"))
      .orderBy("status")
  }

  /** Domain blocklist ([[graft.ops.UrlFilter.flagBlocked]]): URLs
    * synthesized over 20 hosts (every 5th behind a `cdn.` subdomain) are
    * matched against a 3-entry blocklist by host-suffix-on-label-boundary
    * semantics — the subdomain rows prove suffix matching, the oracle's
    * `host = d OR host LIKE '%.' || d` is the same predicate in SQL.
    */
  private def qUrlBlocklist(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val host = when(col("doc_id") % 5 === 0,
      format_string("cdn.site-%d.example.org", pmod(col("doc_id"), lit(20))))
      .otherwise(format_string("site-%d.example.org", pmod(col("doc_id"), lit(20))))
    val withUrl = docs.select(col("doc_id"), col("lang"),
      concat(lit("https://"), host, lit("/"), col("lang"), lit("/doc")).as("url"))
    val blocklist = spark.createDataFrame(Seq(
      Tuple1("site-3.example.org"), Tuple1("site-7.example.org"),
      Tuple1("bad.example.net"))).toDF("domain")
    graft.ops.UrlFilter.flagBlocked(withUrl, "doc_id", "url", blocklist)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("blocked"), 1L).otherwise(0L)).as("n_blocked"),
        min(when(col("blocked"), col("doc_id"))).as("min_blocked"))
      .orderBy("lang")
  }

  /** BPE merge candidates ([[graft.ops.Bpe.pairCounts]]): top-20 adjacent
    * character pairs by frequency-weighted occurrence count — tokenizer
    * training's first merge decision, computed on the vocabulary, not the
    * corpus. Exact integer counts; ordering is total (pair is unique), so
    * the oracle reproduces the top-k row for row.
    */
  private def qBpePairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(t(spark, dir, "documents"))
    graft.ops.Bpe.pairCounts(docs, "text", k = 20)
  }

  /** The FULL BPE training loop ([[graft.ops.Bpe.trainMerges]]): 3
    * count-merge-apply cycles over the vocabulary frame; the readout is
    * the merge table itself — the trained tokenizer. The oracle unrolls
    * the identical cycle in SQL: because merge candidates are restricted
    * to a != b (overlap-free, documented in the op), the Spark side's
    * left-fold application and the oracle's lag-based simultaneous
    * rewrite are provably the same function.
    */
  private def qBpeTrain(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.trainMerges(t(spark, dir, "documents"), "text", rounds = 3)

  /** The BATCHED trainer on its production path
    * ([[graft.ops.Bpe.trainMergesBatched]]): 16 merges at K=8 — two
    * driver rounds of 8 pairwise non-interacting merges, the
    * amortization that makes large-vocabulary training feasible. The
    * oracle reproduces the BATCHED semantics directly (not via the
    * sequential trainer): per round it freezes the pair counts, replays
    * the greedy full-order admission under the symbol+concatenation
    * guard as a recursive CTE over the ranked candidate list, and
    * applies the whole admitted rule SET in one lag-based simultaneous
    * rewrite (sound because admitted symbols are pairwise disjoint — no
    * two matches can be adjacent).
    */
  private def qBpeBatched(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.trainMergesBatched(t(spark, dir, "documents"), "text",
      merges = 16, mergesPerRound = 8)

  /** The trained tokenizer APPLIED — corpus compression after 3 merges
    * ([[graft.ops.Bpe.trainAndApplyStats]]): symbol counts before/after,
    * frequency-weighted, plus the integer-ppm saving. Completes the
    * train→apply lifecycle under one oracle chain (the oracle reads the
    * same unrolled cycle's FINAL vocab frame).
    */
  private def qBpeApply(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.trainAndApplyStats(t(spark, dir, "documents"), "text", rounds = 3)

  /** PMI collocations ([[graft.ops.Collocations.topPmi]]): top-20
    * adjacent word pairs by pointwise mutual information with min support
    * 5 — counting runs on 8-byte hashes, strings join back only for the
    * top candidates. candidateCap is sized above the test corpora's whole
    * qualifying-pair population (asserted in TextOpsSpec) so the top-k is
    * exact and the oracle — the same integer PMI over string pairs —
    * reproduces it row for row.
    */
  private def qCollocations(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(t(spark, dir, "documents"))
    graft.ops.Collocations.topPmi(
      docs, "text", minCount = 5, k = 20, candidateCap = 100000)
  }

  /** Calibration sweep ([[graft.ops.QualityClassifier.calibrationSweep]]):
    * confusion counts of the NB quality filter at five candidate
    * thresholds (±2, ±1, 0 in 1e6-scaled log-odds) in one pass over the
    * held-out scored slice — the operating-point selection step that
    * follows training. The t = 0 row reproduces
    * [[qQualityClassifier]]'s production `n_pred_positive` split by
    * outcome, which chains the two oracles together.
    */
  private def qQualityCalibration(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(t(spark, dir, "documents"))
    val model = QualityClassifier.train(
      docs.filter(col("doc_id") % 2 === 0)
        .withColumn("__label", when(col("lang") === "en", 1).otherwise(0)),
      "text", "__label")
    val scored = QualityClassifier.score(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", model,
      carryCols = Seq("lang"))
      .withColumn("__y", when(col("lang") === "en", 1).otherwise(0))
    val swept = QualityClassifier.calibrationSweep(
        scored, "__y",
        thresholds = Seq(-2000000L, -1000000L, 0L, 1000000L, 2000000L))
      .orderBy("threshold")
    val out = swept.localCheckpoint(true)
    model.release()
    out
  }

  /** Fuzzy decontamination ([[graft.ops.Decontaminate
    * .contaminationCoverage]]): flag (corpus doc, eval item) pairs where
    * >= 50% of the eval item's distinct 8-gram shingles appear in the
    * doc. Planted evidence: each eval item (doc_id < 20) re-enters the
    * corpus as a TRUNCATED copy (first ceil(0.9 n) tokens, id + 1e6) —
    * the partial-leak case the exact any-shingle check over-flags and a
    * coverage test measures; short docs (<= 9 tokens) copy whole and
    * cover 1.0. Truncation is integer arithmetic ((9n+9) div 10) on the
    * NORMALIZED token list, so the oracle rebuilds byte-identical copies.
    */
  private def qDecontaminateFuzzy(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val evalSet = docs.filter(col("doc_id") < 20).select("doc_id", "text")
    val copies = evalSet
      .withColumn("__toks", TF.tokens(col("text")))
      .withColumn("__n", size(col("__toks")))
      .select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(col("__toks"), lit(1),
          expr("cast((__n * 9 + 9) div 10 as int)")), " ").as("text"))
    val corpus = docs.select("doc_id", "text").unionByName(copies)
    graft.ops.Decontaminate.contaminationCoverage(
        spread(corpus), evalSet, "doc_id", "text", 8, 0.5)
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("doc_id")).as("n_docs_flagged"),
        coalesce(sum(floor(col("coverage") * 1e6 + 0.5).cast("long")), lit(0L))
          .as("sum_scaled_cov"))
  }

  /** Cross-corpus near-dedup ([[Dedup.crossCorpusNearDedup]]): a batch
    * (ids % 3 != 0, plus planted 90%-truncated copies of history docs
    * under shifted ids) deduped against history (ids % 3 == 0) by exact
    * >= 0.8 shingle Jaccard after batch x history LSH blocking — the
    * near-duplicate counterpart of q_incremental_dedup (a re-crawl with
    * a changed footer slips past exact keys; this catches it). The
    * oracle recomputes the exact cross-slice pair set; planted copies
    * use the integer truncation arithmetic so both engines build
    * byte-identical texts.
    */
  private def qCrossDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val history = docs.filter(col("doc_id") % 3 === 0).select("doc_id", "text")
    val copies = docs.filter(col("doc_id") % 15 === 0)
      .withColumn("__toks", TF.tokens(col("text")))
      .withColumn("__n", size(col("__toks")))
      .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
        array_join(slice(col("__toks"), lit(1),
          expr("cast((__n * 9 + 9) div 10 as int)")), " ").as("text"))
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
      .select("doc_id", "lang", "text")
      .unionByName(copies)
    Dedup.crossCorpusNearDedup(spread(batch), history, "doc_id", "text", 0.8)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_sum"))
      .orderBy("lang")
  }

  /** Exact duplicated-substring dedup ([[graft.ops.SubstringDedup]], the
    * Lee et al. 2022 shape): duplicated 8-token windows, keep-first
    * ownership (min (doc_id, pos)), per-doc maximal span merge. Planted
    * evidence: truncated copies (first ceil(0.9 n) normalized tokens,
    * id + 1e6) of every 10th doc — the copy's whole text marks as
    * duplicated while the original keeps ownership; natural repeated
    * 8-grams in the base corpus flag on both sides identically.
    */
  private def qSubstringDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val copies = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("__toks", TF.tokens(col("text")))
      .withColumn("__n", size(col("__toks")))
      .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
        array_join(slice(col("__toks"), lit(1),
          expr("cast((__n * 9 + 9) div 10 as int)")), " ").as("text"))
    val corpus = spread(docs.select("doc_id", "lang", "text").unionByName(copies))
    val (stats, release) = graft.ops.SubstringDedup.dedupStats(
      corpus, "doc_id", "text", 8, keepFirst = true, carryCols = Seq("lang"))
    val agg = stats
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs_flagged"),
        sum("n_dup_spans").as("n_spans"),
        sum("dup_tokens").as("sum_dup_tokens"),
        sum(col("n_tokens").cast("long")).as("sum_tokens_flagged"))
      .orderBy("lang")
    val out = agg.localCheckpoint(true)
    release()
    out
  }

  /** Gopher-style repetition signals ([[graft.ops.GopherRepetition]]):
    * top-{2,3}-gram coverage and duplicated-5-gram position-union
    * coverage per doc, all exact integer token numerators. The flag
    * (5·top2 > n_tokens ⟺ top-2-gram share > 0.2) is the paper's
    * threshold in integer arithmetic.
    */
  private def qGopherRepetition(spark: SparkSession, dir: String): DataFrame = {
    val (sig, release) = graft.ops.GopherRepetition.repetitionSignals(
      spread(t(spark, dir, "documents")), "doc_id", "text",
      topNs = Seq(2, 3), dupN = 5, carryCols = Seq("lang"))
    val agg = sig
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("sum_tokens"),
        sum("top2_tokens").as("sum_top2_tokens"),
        sum("top3_tokens").as("sum_top3_tokens"),
        sum("dup5_tokens").as("sum_dup5_tokens"),
        sum(when(col("top2_tokens") * 5 > col("n_tokens"), 1L).otherwise(0L))
          .as("n_flagged_top2"))
      .orderBy("lang")
    val out = agg.localCheckpoint(true)
    release()
    out
  }

  /** BM25 ranked retrieval ([[graft.ops.Bm25]]): three fixed corpus-vocab
    * queries, top-10 docs each. The k1=6/5, b=3/4 integer-rational
    * construction plus logs-of-integers idf make every score an exact
    * long both engines re-derive; ties break on doc_id.
    */
  private def qBm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val queries = Seq((1L, "sort merge join"), (2L, "hash table scan"),
      (3L, "stream window batch")).toDF("qid", "qtext")
    graft.ops.Bm25.bm25TopKFromTf(bm25Tf(spark, dir), "doc_id",
        queries, "qid", "qtext", k = 10)
      .orderBy("qid", "rank")
  }

  /** NDCG@10 retrieval evaluation ([[graft.ops.RetrievalEval]]): the
    * BM25 run scored against a corpus-derived graded relevance set
    * (grade = #distinct query terms present in the doc, 0..3). The ideal
    * ranking is computed from per-grade COUNTS — one bounded hash
    * aggregate, never a corpus sort — and every readout is integer
    * (literal micro-discount weights, `2^rel-1` gains, ppm division), so
    * both engines produce identical rows.
    */
  /** Shared by [[qNdcg]] and [[qRetrievalRecall]] (whose oracles assume
    * identical runs and relevance): the three fixed queries' BM25 top-10
    * run plus graded relevance (rel = #distinct query terms in the doc)
    * computed off the run's OWN persisted postings — one corpus
    * tokenize for run and grading together.
    */
  private def bm25EvalRunAndRels(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val queries = Seq((1L, "sort merge join"), (2L, "hash table scan"),
      (3L, "stream window batch")).toDF("qid", "qtext")
    val tf = bm25Tf(spark, dir)
    val run = graft.ops.Bm25.bm25TopKFromTf(
      tf, "doc_id", queries, "qid", "qtext", k = 10)
    val qt = queries.select(col("qid"),
      explode(array_distinct(TF.tokenHashes(col("qtext")))).as("th"))
    val rels = tf.join(broadcast(qt), "th")
      .groupBy("qid", "doc_id").agg(count(lit(1)).as("rel"))
    (run, rels)
  }

  private def qNdcg(spark: SparkSession, dir: String): DataFrame = {
    val (run, rels) = bm25EvalRunAndRels(spark, dir)
    graft.ops.RetrievalEval.ndcgAtK(
        run, "qid", "doc_id", "rank", rels, "qid", "doc_id", "rel", k = 10)
      .orderBy("qid")
  }

  /** Recall@10 + reciprocal rank ([[RetrievalEval.recallAtK]]) for the
    * same BM25 run, binary relevance = "doc contains >= 2 of the query's
    * terms". One run⋈rels join + one bounded aggregate; ppm integer
    * readouts (averaging rr_ppm across queries is MRR).
    */
  private def qRetrievalRecall(spark: SparkSession, dir: String): DataFrame = {
    val (run, rels) = bm25EvalRunAndRels(spark, dir)
    graft.ops.RetrievalEval.recallAtK(
        run, "qid", "doc_id", "rank", rels.filter(col("rel") >= 2),
        "qid", "doc_id", k = 10)
      .orderBy("qid")
  }

  /** Hybrid retrieval via reciprocal-rank fusion ([[graft.ops.Rrf]]):
    * THE hybrid-search shape — a lexical BM25 run over document text and
    * a semantic brute-force cosine run over the aligned embeddings table
    * (same id space), each top-20 per query, fused by integer
    * `1e9 div (60 + rank)` and re-ranked top-10. Only ranks cross runs,
    * so the incomparable score scales (scaled-long BM25, float cosine)
    * fuse without calibration.
    */
  private def qHybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(t(spark, dir, "documents"))
    val emb = t(spark, dir, "embeddings")
    val lex = graft.ops.Bm25.bm25TopKFromTf(
      bm25Tf(spark, dir), "doc_id",
      docs.filter(col("doc_id") < 10)
        .select(col("doc_id").as("qid"), col("text").as("qtext")),
      "qid", "qtext", k = 20)
    val sem = Similarity.bruteForceTopK(
      emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 20)
    graft.ops.Rrf.fuse(Seq(
        lex.select(col("qid"), col("doc_id").as("id"), col("rank")),
        sem.select(col("query_id").as("qid"), col("neighbor_id").as("id"),
          col("rank"))),
      "qid", "id", topK = 10)
      .orderBy("qid", "rank")
  }

  /** Hard-negative mining ([[Similarity.hardNegatives]]): for each
    * anchor embedding, the top-5 most-similar vectors with a DIFFERENT
    * label, near-identical candidates (cosine >= 0.99) excluded — the
    * contrastive-training batch-construction op. Rank-only output (the
    * q_embed_topk pattern): float cosines never cross the oracle
    * boundary, orderings must.
    */
  private def qHardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", "label", k = 5)
      .withColumn("neg_label", col("neg_label").cast("long"))
      .orderBy("anchor_id", "rank")
  }

  /** Exact-k-per-group sampling ([[Sampling.exactKPerGroup]]): a fixed
    * 20-doc eval set per language, selected by the cross-engine md5
    * pseudo-random order — the set itself is the oracle contract,
    * row-for-row.
    */
  private def qGroupSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.exactKPerGroup(spread(t(spark, dir, "documents")),
        Seq("lang"), "doc_id", k = 20, seed = "s1")
      .select("lang", "sample_rank", "doc_id")
      .orderBy("lang", "sample_rank")

  /** Token-entropy quality signal ([[NgramLm.tokenEntropy]]): exact
    * integer Shannon entropy of each doc's token distribution — the
    * template-spam / gibberish discriminator one step up from the
    * repetition ratio. The low-entropy flag threshold sits between the
    * corpus p10 and p90 so it discriminates.
    */
  private def qTokenEntropy(spark: SparkSession, dir: String): DataFrame =
    NgramLm.tokenEntropy(spread(t(spark, dir, "documents")),
        "doc_id", "text", carryCols = Seq("lang"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("scaled_entropy_num").as("sum_scaled_h_num"),
        sum("n_tokens").as("sum_tokens"),
        sum(when(col("scaled_entropy_num") < lit(3000000L) * col("n_tokens"), 1L)
          .otherwise(0L)).as("n_low_entropy"))
      .orderBy("lang")

  /** Column profiling ([[graft.ops.Profile]]): the ANALYZE-style first
    * look at an unknown table — one scan, one reduce, melted to a row per
    * column. Exact distincts here (bounded table + oracle comparison); the
    * operator defaults to HLL at scale.
    */
  private def qProfile(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Profile.profile(t(spark, dir, "documents"),
      Seq("doc_id", "lang", "n_chars", "source"), exact = true)
      .orderBy("column_name")

  /** The HLL-mode profile — the scale DEFAULT (per-column exact distinct
    * forces an Expand + full-value shuffle) — graded against its accuracy
    * envelope, q_hll style: every sketch estimate must land within ±5% of
    * the exact count the oracle reproduces (rsd 0.02, deterministic for a
    * given dataset).
    */
  private def qProfileApprox(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val cols = Seq("doc_id", "lang", "n_chars", "source")
    val exact = graft.ops.Profile.profile(docs, cols, exact = true)
    val approx = graft.ops.Profile.profile(docs, cols, exact = false, rsd = 0.02)
      .select(col("column_name"), col("n_distinct").as("__approx"))
    exact.join(approx, Seq("column_name"))
      .select(col("column_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct").as("n_distinct_exact"),
        (abs(col("__approx") - col("n_distinct")).cast("double") /
          col("n_distinct").cast("double") <= 0.05).as("within_5pct"))
      .orderBy("column_name")
  }

  /** Per-source frequency cap (RefinedWeb-style domain capping): keep at
    * most 5 docs per source, preferring longer docs (n_chars DESC, doc_id
    * tiebreak). The rank<=5 filter compiles to WindowGroupLimit — Spark
    * pushes a per-partition top-k below the shuffle, so the exchange
    * carries at most 5 rows per (source, map partition), not the corpus.
    */
  private def qDomainCap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id").asc)
    t(spark, dir, "documents")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum("n_chars").as("kept_chars"),
        min("doc_id").as("min_kept_id"))
      .orderBy("source")
  }

  /** PageRank link authority ([[graft.ops.PageRank]]): the graph-derived
    * quality prior over a 20-host link graph derived deterministically
    * from the documents table (each doc's host links to one or two other
    * hosts; three hosts have no out-links and exercise the dangling-mass
    * correction). 3 damped power iterations in exact scaled-long
    * arithmetic — the oracle unrolls the same integer recurrence in SQL
    * and must match bit-for-bit.
    */
  private def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    val (ranks, release) =
      PageRank.pageRank(docLinkEdges(spark, dir), "src", "dst", iterations = 3)
    val out = ranks.orderBy("node").localCheckpoint(true)
    release()
    out
  }

  /** Triangle census of the link graph ([[graft.ops.Triangles]]) — the
    * compact-forward count: edges deduped undirected, oriented low-degree
    * to high so wedge fan-out is arboricity-bounded on hubs, two plain
    * equi-joins. The oracle rebuilds the same graph and reproduces node/
    * edge/wedge/triangle counts exactly (the wedge count pins the
    * orientation rule itself — sum over oriented out-degrees of C(d,2)).
    */
  private def qTriangles(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Triangles.count(docLinkEdges(spark, dir), "src", "dst")

  /** Community detection ([[graft.ops.LabelPropagation]], 3 synchronous
    * rounds) on the link graph — deterministic by construction (sync
    * rounds + min-label tie-break), so the oracle unrolls the identical
    * recurrence as SQL CTEs and the assignment matches bit-for-bit.
    */
  private def qLabelProp(spark: SparkSession, dir: String): DataFrame =
    graft.ops.LabelPropagation.run(docLinkEdges(spark, dir), "src", "dst", 3)
      .groupBy("label")
      .agg(count(lit(1)).as("n_nodes"), min("node").as("min_node"))
      .orderBy("label")

  /** Link distance from trusted hosts ([[graft.ops.Bfs]]): exact directed
    * hop counts from the {site-0, site-1} seed set over the 20-host link
    * graph, 4 rounds of frontier expansion (one frontier⋈edges join + one
    * anti-join per round, early exit on an empty frontier). The
    * spam-demotion "distance from seeds" prior next to [[qTrustrank]].
    */
  private def qBfsHops(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val seeds = Seq("site-0", "site-1").toDF("s")
    Bfs.hops(docLinkEdges(spark, dir), "src", "dst", seeds, "s", maxHops = 4)
      .groupBy("hop")
      .agg(count(lit(1)).as("n_nodes"), min("node").as("min_node"))
      .orderBy("hop")
  }

  /** k-core peeling ([[graft.ops.KCore]]): 3 synchronous peel rounds at
    * k=2 over the 20-host link graph — the dense-cohesion filter
    * (degree-1 tendrils peel, the cycle-rich core survives). A fixed
    * round count makes the result a pure function of (graph, k, rounds),
    * so the oracle unrolls the identical recurrence; KCoreSpec owns the
    * fixpoint/cascade semantics.
    */
  private def qKcore(spark: SparkSession, dir: String): DataFrame = {
    val (core, _) = graft.ops.KCore.peel(
      docLinkEdges(spark, dir), "src", "dst", k = 2, rounds = 3)
    core.agg(count(lit(1)).as("n_core_nodes"),
      coalesce(sum("degree"), lit(0L)).as("sum_core_degree"),
      min("node").as("min_node"))
  }

  /** The deterministic 20-host link graph both rank queries run on. */
  private def docLinkEdges(spark: SparkSession, dir: String): DataFrame = {
    val h = t(spark, dir, "documents")
      .select((col("doc_id") % 20).as("d"), col("doc_id"))
      .filter(col("d") < 17)
    val e1 = h.select(
      concat(lit("site-"), col("d").cast("string")).as("src"),
      concat(lit("site-"), ((col("doc_id") * 7 + 3) % 20).cast("string")).as("dst"))
    val e2 = h.filter(col("d") % 3 === 0).select(
      concat(lit("site-"), col("d").cast("string")).as("src"),
      concat(lit("site-"), ((col("doc_id") * 3 + 5) % 20).cast("string")).as("dst"))
    e1.union(e2)
  }

  /** TrustRank ([[graft.ops.PageRank.personalizedPageRank]]): restart
    * mass pinned to five trusted hosts; stationary mass then measures
    * link-proximity to the trusted set — the spam-demotion prior. Same
    * bit-exact integer recurrence as q_pagerank with a seed-indicator
    * restart vector.
    */
  private def qTrustrank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val seeds = (0 until 5).map(i => s"site-$i").toDF("node")
    val (ranks, release) = PageRank.personalizedPageRank(
      docLinkEdges(spark, dir), "src", "dst", seeds, "node", iterations = 3)
    val out = ranks.orderBy("node").localCheckpoint(true)
    release()
    out
  }

  /** Deterministic global shuffle + exact-size sharding
    * ([[Sampling.shardAssign]]): the training-export step — 8 shards cut
    * from the corpus-wide md5 order, sizes balanced to ±1 row. The oracle
    * recomputes the same order/rank/floor-div assignment in SQL; per-shard
    * id-sum + boundary keys pin the exact membership of every shard.
    */
  private def qShardAssign(spark: SparkSession, dir: String): DataFrame = {
    val (sharded, release) = Sampling.shardAssign(
      spread(t(spark, dir, "documents")), "doc_id", nShards = 8, seed = "sh1")
    val out = sharded.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("doc_id").as("sum_ids"),
        min("shuffle_key").as("min_key"),
        max("shuffle_key").as("max_key"))
      .orderBy("shard")
      .localCheckpoint(true)
    release()
    out
  }

  /** Deterministic upsampling ([[Sampling.upsample]]): sources are
    * weighted 2.5x / 1x / 0.4x / 0x by source number mod 4 — whole
    * copies plus a hash-selected fractional copy, zero-shuffle scan-side
    * explode. The checksum over `doc_id·(copy_idx+1)` pins exactly which
    * rows got which copy count.
    */
  private def qUpsample(spark: SparkSession, dir: String): DataFrame = {
    val srcNum = substring(col("source"), 4, 10).cast("long")
    val bp = when(pmod(srcNum, lit(4L)) === 0L, 25000L)
      .when(pmod(srcNum, lit(4L)) === 1L, 10000L)
      .when(pmod(srcNum, lit(4L)) === 2L, 4000L)
      .otherwise(0L)
    Sampling.upsample(t(spark, dir, "documents"), col("doc_id"), bp, seed = 11)
      .groupBy("source")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct("doc_id").as("n_docs"),
        sum(col("doc_id") * (col("copy_idx") + 1)).as("copy_checksum"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------- maps

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_log_parse_agg" -> (qLogParseAgg _),
    "q_log_partitioned" -> (qLogPartitioned _),
    "q_log_dircols" -> (qLogDircols _),
    "q_log_sqlpath" -> (qLogSqlPath _),
    "q_log_apache" -> (qLogApache _),
    "q_log_pushdown" -> (qLogPushdown _),
    "q_log_dropmalformed" -> (qLogDropMalformed _),
    "q_log_multiline" -> (qLogMultiline _),
    "q_log_unmatched" -> (qLogUnmatched _),
    "q_log_typed_dates" -> (qLogTypedDates _),
    "q_log_timestamp" -> (qLogTimestamp _),
    "q_log_failfast" -> (qLogFailfast _),
    "q_log_gzip" -> (qLogGzip _),
    "q_log_bzip2" -> (qLogBzip2 _),
    "q_log_stream" -> (qLogStream _),
    "q1_agg" -> (q1Agg _),
    "q_filter_project" -> (qFilterProject _),
    "q_join_broadcast" -> (qJoinBroadcast _),
    "q_join_5way" -> (qJoin5Way _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_window_topk" -> (qWindowTopk _),
    "q_window_lag" -> (qWindowLag _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_json_extract" -> (qJsonExtract _),
    "q_supplier_topk" -> (qSupplierTopk _),
    "q_hll" -> (qHll _),
    "q_hll_sketch_union" -> (qHllSketchUnion _),
    "q_session_window" -> (qSessionWindow _),
    "q_distinct_agg" -> (qDistinctAgg _),
    "q_multi_distinct" -> (qMultiDistinct _),
    "q_observe" -> (qObserve _),
    "q_typed_agg" -> (qTypedAgg _),
    "q_percentile" -> (qPercentile _),
    "q_approx_percentile" -> (qApproxPercentile _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_heavy_hitters_docs" -> (qHeavyHittersDocs _),
    "q_url_extract" -> (qUrlExtract _),
    "q_event_anomaly" -> (qEventAnomaly _),
    "q_doc_anomaly" -> (qDocAnomaly _),
    "q_gap_fill" -> (qGapFill _),
    "q_mad_outliers" -> (qMadOutliers _),
    "q_interval_coverage" -> (qIntervalCoverage _),
    "q_cdc_apply" -> (qCdcApply _),
    "q_streaming_cdc" -> (qStreamingCdc _),
    "q_streaks" -> (qStreaks _),
    "q_time_weighted" -> (qTimeWeighted _),
    "q_transform_state" -> (qTransformState _),
    "q_pseudonymize" -> (qPseudonymize _),
    "q_trend" -> (qTrend _),
    "q_chi2" -> (qChi2 _),
    "q_pivot" -> (qPivot _),
    "q_funnel" -> (qFunnel _),
    "q_cohort_retention" -> (qCohortRetention _),
    "q_itemsets" -> (qItemsets _),
    "q_markov" -> (qMarkov _),
    "q_fuzzy_match" -> (qFuzzyMatch _),
    "q_entity_clusters" -> (qEntityClusters _),
    "q_winsorize" -> (qWinsorize _),
    "q_cusum" -> (qCusum _),
    "q_source_gini" -> (qSourceGini _),
    "q_kappa" -> (qKappa _),
    "q_acf" -> (qAcf _),
    "q_mann_whitney" -> (qMannWhitney _),
    "q_link_predict" -> (qLinkPredict _),
    "q_flesch" -> (qFlesch _),
    "q_mmr_diversify" -> (qMmrDiversify _),
    "q_rake_keywords" -> (qRakeKeywords _),
    "q_range_shards" -> (qRangeShards _),
    "q_burstiness" -> (qBurstiness _),
    "q_centroid_classify" -> (qCentroidClassify _),
    "q_time_travel" -> (qTimeTravel _),
    "q_attribution" -> (qAttribution _),
    "q_click_paths" -> (qClickPaths _),
    "q_ab_test" -> (qAbTest _),
    "q_kmeans_exact" -> (qKmeansExact _),
    "q_dbscan" -> (qDbscan _),
    "q_silhouette" -> (qSilhouette _),
    "q_skyline" -> (qSkyline _),
    "q_ks_test" -> (qKsTest _),
    "q_assortativity" -> (qAssortativity _),
    "q_hits" -> (qHits _),
    "q_corr_matrix" -> (qCorrMatrix _),
    "q_freshness" -> (qFreshness _),
    "q_seq_patterns" -> (qSeqPatterns _),
    "q_entropy_rate" -> (qEntropyRate _),
    "q_theil_sen" -> (qTheilSen _),
    "q_pareto" -> (qPareto _),
    "q_funnel3" -> (qFunnel3 _),
    "q_mutual_info" -> (qMutualInfo _),
    "q_benford" -> (qBenford _),
    "q_quantile_norm" -> (qQuantileNorm _),
    "q_pattern_negation" -> (qPatternNegation _),
    "q_peak_concurrency" -> (qPeakConcurrency _),
    "q_boolean_retrieval" -> (qBooleanRetrieval _),
    "q_phrase_search" -> (qPhraseSearch _),
    "q_value_histogram" -> (qValueHistogram _),
    "q_lsh_bucket_audit" -> (qLshBucketAudit _),
    "q_setops" -> (qSetOps _),
    "q_scalar_funcs" -> (qScalarFuncs _),
    "q_array_funcs" -> (qArrayFuncs _),
    "q_regex_extract" -> (qRegexExtract _),
    "q_asof_join" -> (qAsofJoin _),
    "q_asof_forward" -> (qAsofForward _),
    "q_asof_tolerance" -> (qAsofTolerance _),
    "q_range_join" -> (qRangeJoin _),
    "q_overlap_join" -> (qOverlapJoin _),
    "q_overlap_autobucket" -> (qOverlapAutoBucket _),
    "q_skew_join" -> (qSkewJoin _),
    "q_bucketed_join" -> (qBucketedJoin _),
    "q_runtime_bloom" -> (qRuntimeBloom _),
    "q_dpp" -> (qDpp _),
    "q_meta_count" -> (qMetaCount _),
    "q_compaction" -> (qCompaction _),
    "q_zorder_scan" -> (qZorderScan _),
    "q_scd2" -> (qScd2 _),
    "q_constraints" -> (qConstraints _),
    "q_golden_record" -> (qGoldenRecord _),
    "q_streaming_window" -> (qStreamingWindow _),
    "q_streaming_sink" -> (qStreamingSink _),
    "q_streaming_chunk" -> (qStreamingChunk _),
    "q_streaming_join" -> (qStreamingJoin _),
    "q_sessionize_custom" -> (qSessionizeCustom _),
    "q_timed_sessions" -> (qTimedSessions _),
    "q_map_state" -> (qMapState _),
    "q_list_state" -> (qListState _),
    "q_array_setops" -> (qArraySetops _),
    "q_map_funcs" -> (qMapFuncs _),
    "q_streaming_full_join" -> (qStreamingFullJoin _),
    "q_streaming_left_join" -> (qStreamingLeftJoin _),
    "q_streaming_hll" -> (qStreamingHll _),
    "q_streaming_heavy_hitters" -> (qStreamingHeavyHitters _),
    "q_streaming_dedup" -> (qStreamingDedup _),
    "q_stream_static_join" -> (qStreamStaticJoin _),
    "q_sliding_window" -> (qSlidingWindow _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_venn3" -> (qVenn3 _),
    "q_dedup_groups" -> (qDedupGroups _),
    "q_ngram_jaccard" -> (qNgramJaccard _),
    "q_containment" -> (qContainment _),
    "q_minhash_lsh" -> (qMinhashLsh _),
    "q_simhash" -> (qSimhash _),
    "q_dup_clusters" -> (qDupClusters _),
    "q_incremental_dedup" -> (qIncrementalDedup _),
    "q_dedup_keep_best" -> (qDedupKeepBest _),
    "q_sample_hash" -> (qSampleHash _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_group_split" -> (qGroupSplit _),
    "q_domain_mix" -> (qDomainMix _),
    "q_text_normalize" -> (qTextNormalize _),
    "q_partitioned_write" -> (qPartitionedWrite _),
    "q_partition_upsert" -> (qPartitionUpsert _),
    "q_embed_topk" -> (qEmbedTopk _),
    "q_embed_centroids" -> (qEmbedCentroids _),
    "q_embed_dispersion" -> (qEmbedDispersion _),
    "q_embed_lsh" -> (qEmbedLsh _),
    "q_embed_ivf" -> (qEmbedIvf _),
    "q_embed_neardup" -> (qEmbedNeardup _),
    "q_semantic_dedup" -> (qSemanticDedup _),
    "q_semantic_keepbest" -> (qSemanticKeepBest _),
    "q_embed_pq" -> (qEmbedPq _),
    "q_embed_adc" -> (qEmbedAdc _),
    "q_embed_ivfpq" -> (qEmbedIvfPq _),
    "q_ann_rerank" -> (qAnnRerank _),
    "q_multi_format" -> (qMultiFormat _),
    "q_schema_merge" -> (qSchemaMerge _),
    "q_embed_whiten" -> (qEmbedWhiten _),
    "q_oov_rate" -> (qOovRate _),
    "q_kl_sources" -> (qKlSources _),
    "q_skew_report" -> (qSkewReport _),
    "q_join_size_est" -> (qJoinSizeEst _),
    "q_tpch_q3" -> (qTpchQ3 _),
    "q_tpch_q1" -> (qTpchQ1 _),
    "q_tpch_q5" -> (qTpchQ5 _),
    "q_exists_subq" -> (qExistsSubq _),
    "q_tpch_q18" -> (qTpchQ18 _),
    "q_tpch_q14" -> (qTpchQ14 _),
    "q_tpch_q2" -> (qTpchQ2 _),
    "q_tpch_q4" -> (qTpchQ4 _),
    "q_tpch_q7" -> (qTpchQ7 _),
    "q_tpch_q8" -> (qTpchQ8 _),
    "q_tpch_q9" -> (qTpchQ9 _),
    "q_tpch_q11" -> (qTpchQ11 _),
    "q_tpch_q12" -> (qTpchQ12 _),
    "q_tpch_q13" -> (qTpchQ13 _),
    "q_tpch_q15" -> (qTpchQ15 _),
    "q_tpch_q16" -> (qTpchQ16 _),
    "q_tpch_q17" -> (qTpchQ17 _),
    "q_tpch_q19" -> (qTpchQ19 _),
    "q_tpch_q20" -> (qTpchQ20 _),
    "q_tpch_q21" -> (qTpchQ21 _),
    "q_tpch_q22" -> (qTpchQ22 _),
    "q_recursive_cte" -> (qRecursiveCte _),
    "q_posexplode" -> (qPosexplode _),
    "q_k_anonymity" -> (qKAnonymity _),
    "q_epoch_shuffle" -> (qEpochShuffle _),
    "q_variant" -> (qVariant _),
    "q_xml_extract" -> (qXmlExtract _),
    "q_listagg" -> (qListagg _),
    "q_bit_agg" -> (qBitAgg _),
    "q_curriculum" -> (qCurriculum _),
    "q_pipeline_pretrain" -> (qPipelinePretrain _),
    "q_window_range" -> (qWindowRange _),
    "q_tpch_q6" -> (qTpchQ6 _),
    "q_tpch_q10" -> (qTpchQ10 _),
    "q_window_suite" -> (qWindowSuite _),
    "q_string_suite" -> (qStringSuite _),
    "q_cond_agg" -> (qCondAgg _),
    "q_null_suite" -> (qNullSuite _),
    "q_incremental_agg" -> (qIncrementalAgg _),
    "q_date_suite" -> (qDateSuite _),
    "q_setops_all" -> (qSetopsAll _),
    "q_unpivot" -> (qUnpivot _),
    "q_json_struct" -> (qJsonStruct _),
    "q_decimal" -> (qDecimal _),
    "q_correlated_subq" -> (qCorrelatedSubq _),
    "q_lang_id" -> (qLangId _),
    "q_quality" -> (qQuality _),
    "q_token_stats" -> (qTokenStats _),
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_multimodal_features" -> (qMultimodalFeatures _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_audio_features" -> (qAudioFeatures _),
    "q_video_frames" -> (qVideoFrames _),
    "q_rolling_fingerprint" -> (qRollingFingerprint _),
    "q_repetition" -> (qRepetition _),
    "q_pii_redact" -> (qPiiRedact _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_pipeline_e2e" -> (qPipelineE2e _),
    "q_tfidf_top" -> (qTfidfTop _),
    "q_seq_pack" -> (qSeqPack _),
    "q_chunk_split" -> (qChunkSplit _),
    "q_common_ngrams" -> (qCommonNgrams _),
    "q_embed_quantize" -> (qEmbedQuantize _),
    "q_unigram_lm" -> (qUnigramLm _),
    "q_ppl_buckets" -> (qPplBuckets _),
    "q_external_lm" -> (qExternalLm _),
    "q_dsir" -> (qDsir _),
    "q_c4_clean" -> (qC4Clean _),
    "q_streaming_c4" -> (qStreamingC4 _),
    "q_quality_classifier" -> (qQualityClassifier _),
    "q_quality_calibration" -> (qQualityCalibration _),
    "q_collocations" -> (qCollocations _),
    "q_bpe_pairs" -> (qBpePairs _),
    "q_bpe_train" -> (qBpeTrain _),
    "q_bpe_batched" -> (qBpeBatched _),
    "q_bpe_apply" -> (qBpeApply _),
    "q_url_blocklist" -> (qUrlBlocklist _),
    "q_corpus_diff" -> (qCorpusDiff _),
    "q_substring_dedup" -> (qSubstringDedup _),
    "q_gopher_repetition" -> (qGopherRepetition _),
    "q_bm25" -> (qBm25 _),
    "q_ndcg" -> (qNdcg _),
    "q_retrieval_recall" -> (qRetrievalRecall _),
    "q_hybrid_rrf" -> (qHybridRrf _),
    "q_hard_negatives" -> (qHardNegatives _),
    "q_group_sample" -> (qGroupSample _),
    "q_semantic_decontam" -> (qSemanticDecontam _),
    "q_streaming_neardedup" -> (qStreamingNearDedup _),
    "q_url_canonical" -> (qUrlCanonical _),
    "q_embed_prep" -> (qEmbedPrep _),
    "q_ivf_drift" -> (qIvfDrift _),
    "q_streaming_classify" -> (qStreamingClassify _),
    "q_dup_histogram" -> (qDupHistogram _),
    "q_decontaminate_fuzzy" -> (qDecontaminateFuzzy _),
    "q_profile_approx" -> (qProfileApprox _),
    "q_cross_dedup" -> (qCrossDedup _),
    "q_token_entropy" -> (qTokenEntropy _),
    "q_paragraph_dedup" -> (qParagraphDedup _),
    "q_bigram_lm" -> (qBigramLm _),
    "q_profile" -> (qProfile _),
    "q_pagerank" -> (qPagerank _),
    "q_triangles" -> (qTriangles _),
    "q_label_prop" -> (qLabelProp _),
    "q_bfs_hops" -> (qBfsHops _),
    "q_kcore" -> (qKcore _),
    "q_trustrank" -> (qTrustrank _),
    "q_upsample" -> (qUpsample _),
    "q_shard_assign" -> (qShardAssign _),
    "q_domain_cap" -> (qDomainCap _))

  // DuckDB SQL fragments shared below.
  private val NormSql = "trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'))"
  private val FpSql = s"substr(md5($NormSql), 1, 16)"
  private val ToksSql =
    s"list_filter(string_split_regex($NormSql, '\\s+'), x -> x <> '')"

  /** [[graft.ops.Rake.DefaultStopwords]] as a SQL IN-list — generated from
    * the ONE list so the operator and its oracle cannot drift. */
  private val RakeStopSql =
    graft.ops.Rake.DefaultStopwords.map(w => s"'$w'").mkString(", ")

  /** The BPE oracle: `rounds` count-merge-apply cycles unrolled as CTE
    * chains. Per round k: x/c = weighted adjacent-pair counts over the
    * previous vocab (a != b only — overlap-free by construction), t = the
    * argmax pair with deterministic tiebreak, e/f/g/v = the simultaneous
    * rewrite (a position is consumed iff its left neighbor matched; no
    * two matches can be adjacent because a != b). The last round skips
    * the rewrite — only its chosen pair is read out.
    */
  private def bpeOracleSql(rounds: Int): String = {
    val head =
      s"""WITH tok AS (SELECT unnest($ToksSql) AS w FROM documents),
         |v0 AS (SELECT w, count(*) AS cnt, regexp_split_to_array(w, '') AS syms
         |       FROM tok GROUP BY w),""".stripMargin
    val perRound = (1 to rounds).map { k =>
      val p = k - 1
      val count =
        s"""x$k AS (SELECT w, cnt, syms, unnest(range(1, list_count(syms))) AS i
           |        FROM v$p),
           |c$k AS (SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(cnt) AS BIGINT) AS n
           |        FROM x$k WHERE syms[i] <> syms[i+1] GROUP BY 1, 2),
           |t$k AS (SELECT a, b, n FROM c$k
           |        QUALIFY row_number() OVER (ORDER BY n DESC, a, b) = 1)""".stripMargin
      val apply =
        s"""e$k AS (SELECT v.w, v.cnt, t.a, t.b, t.a || t.b AS ab, v.syms,
           |               unnest(range(1, list_count(v.syms) + 1)) AS i
           |        FROM v$p v CROSS JOIN t$k t),
           |f$k AS (SELECT w, cnt, ab, i, syms[i] AS s,
           |               (i < list_count(syms) AND syms[i] = a AND syms[i+1] = b) AS m
           |        FROM e$k),
           |g$k AS (SELECT *, coalesce(lag(m) OVER (PARTITION BY w ORDER BY i), false)
           |               AS consumed FROM f$k),
           |v$k AS (SELECT w, min(cnt) AS cnt,
           |               list(CASE WHEN m THEN ab ELSE s END ORDER BY i) AS syms
           |        FROM g$k WHERE NOT consumed GROUP BY w)""".stripMargin
      count + ",\n" + apply
    }.mkString(",\n")
    val readout = (1 to rounds)
      .map(k => s"SELECT $k AS round, a AS tok_a, b AS tok_b, n FROM t$k")
      .mkString("\n", "\nUNION ALL ", "\nORDER BY round")
    head + "\n" + perRound + readout
  }

  /** The BATCHED-BPE oracle: frozen-count rounds unrolled, each
    * admitting up to `min(k, merges − done)` merges by replaying the
    * trainer's greedy full-order admission as a RECURSIVE CTE over the
    * ranked candidate list (state = the symbol/concatenation guard + the
    * picked list; step rn admits candidate rn iff its symbols and
    * concatenation avoid the guard and the batch isn't full). Round
    * boundaries are DATA-DEPENDENT — a round admits fewer than `k` when
    * the corpus runs out of pairwise-disjoint pairs (sf0.001 round 1
    * yields 7 of 8) — so each round carries a cumulative `done` counter
    * (d$r) and the unroll is sized generously (`maxRounds`); surplus
    * rounds admit nothing and rewrite by identity, mirroring the Spark
    * loop's termination exactly. The rewrite applies the whole admitted
    * rule set in one lag-based pass — sound because admitted symbols are
    * pairwise disjoint, so no two matches are adjacent (same argument as
    * the sequential oracle's single-pair rewrite). Rule keys join
    * symbols with chr(10), which can never occur inside a token.
    */
  private def bpeBatchedOracleSql(merges: Int, k: Int, maxRounds: Int): String = {
    val head =
      s"""WITH RECURSIVE tok AS MATERIALIZED (SELECT unnest($ToksSql) AS w FROM documents),
         |v0 AS MATERIALIZED (SELECT w, count(*) AS cnt, regexp_split_to_array(w, '') AS syms
         |       FROM tok GROUP BY w),
         |d0 AS (SELECT CAST(0 AS BIGINT) AS done),""".stripMargin
    val perRound = (1 to maxRounds).map { r =>
      val p = r - 1
      val adm = s"""len(s.picked) < least($k, $merges - (SELECT done FROM d$p))
           |              AND NOT list_contains(s.guard, o.a)
           |              AND NOT list_contains(s.guard, o.b)
           |              AND NOT list_contains(s.guard, o.a || o.b)""".stripMargin
      s"""x$r AS (SELECT w, cnt, syms, unnest(range(1, list_count(syms))) AS i
         |        FROM v$p),
         |c$r AS (SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(cnt) AS BIGINT) AS n
         |        FROM x$r WHERE syms[i] <> syms[i+1] GROUP BY 1, 2),
         |o$r AS MATERIALIZED (SELECT a, b, n,
         |          CAST(row_number() OVER (ORDER BY n DESC, a, b) AS BIGINT) AS rn
         |        FROM c$r),
         |adm$r AS (
         |  SELECT CAST(0 AS BIGINT) AS rn, CAST([] AS VARCHAR[]) AS guard,
         |         CAST([] AS STRUCT(a VARCHAR, b VARCHAR, n BIGINT)[]) AS picked
         |  UNION ALL
         |  SELECT o.rn,
         |    CASE WHEN $adm
         |         THEN list_concat(s.guard, [o.a, o.b, o.a || o.b]) ELSE s.guard END,
         |    CASE WHEN $adm
         |         THEN list_append(s.picked, {'a': o.a, 'b': o.b, 'n': o.n})
         |         ELSE s.picked END
         |  FROM adm$r s JOIN o$r o ON o.rn = s.rn + 1),
         |p$r AS MATERIALIZED (SELECT picked FROM adm$r ORDER BY rn DESC LIMIT 1),
         |d$r AS MATERIALIZED (SELECT d.done + len(p.picked) AS done FROM d$p d, p$r p),
         |r$r AS MATERIALIZED (SELECT list_transform(picked, q -> q.a || chr(10) || q.b) AS ks,
         |               list_transform(picked, q -> q.a || q.b) AS vs FROM p$r),
         |e$r AS (SELECT w, cnt, syms, unnest(range(1, list_count(syms) + 1)) AS i
         |        FROM v$p),
         |f$r AS (SELECT e.w, e.cnt, e.i, e.syms[e.i] AS s,
         |               (e.i < list_count(e.syms) AND list_contains(rr.ks,
         |                  e.syms[e.i] || chr(10) || e.syms[e.i+1])) AS m,
         |               rr.vs[list_position(rr.ks,
         |                  e.syms[e.i] || chr(10) || e.syms[e.i+1])] AS ab
         |        FROM e$r e CROSS JOIN r$r rr),
         |g$r AS (SELECT *, coalesce(lag(m) OVER (PARTITION BY w ORDER BY i), false)
         |               AS consumed FROM f$r),
         |v$r AS MATERIALIZED (SELECT w, min(cnt) AS cnt,
         |               list(CASE WHEN m THEN ab ELSE s END ORDER BY i) AS syms
         |        FROM g$r WHERE NOT consumed GROUP BY w)""".stripMargin
    }.mkString(",\n")
    val readout = (1 to maxRounds).map { r =>
      val p = r - 1
      s"""SELECT CAST((SELECT done FROM d$p) + gs.i AS INT) AS round,
         |       p.picked[gs.i].a AS tok_a, p.picked[gs.i].b AS tok_b,
         |       p.picked[gs.i].n AS n
         |FROM p$r p, LATERAL (SELECT unnest(range(1, len(p.picked) + 1)) AS i) gs""".stripMargin
    }.mkString("\n", "\nUNION ALL\n", "\nORDER BY round")
    head + "\n" + perRound + readout
  }

  /** The apply-side BPE oracle: same unrolled cycle, readout = the
    * corpus compression stats off the FINAL vocab frame v{rounds}
    * (unreferenced CTEs of the chain are skipped by the engine).
    */
  private def bpeApplyOracleSql(rounds: Int): String = {
    val full = bpeOracleSql(rounds)
    val ctes = full.substring(0, full.lastIndexOf("\nSELECT 1 AS round"))
    s"""$ctes
       |SELECT count(*) AS n_types, CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |       CAST(sum(cnt * length(w)) AS BIGINT) AS syms_before,
       |       CAST(sum(cnt * list_count(syms)) AS BIGINT) AS syms_after,
       |       (1000000 * (CAST(sum(cnt * length(w)) AS BIGINT) -
       |                   CAST(sum(cnt * list_count(syms)) AS BIGINT)))
       |         // CAST(sum(cnt * length(w)) AS BIGINT) AS saved_ppm
       |FROM v$rounds""".stripMargin
  }

  /** C4 oracle shared by the batch and streaming queries: pages
    * rebuilt from tokens identically in SQL, same rule predicates.
    */
  private lazy val C4CleanOracleSql =
    s"""WITH tk AS (SELECT doc_id, lang, $ToksSql AS t FROM documents),
       |ln0 AS (SELECT doc_id, lang, gs.i AS i,
       |          array_to_string(t[(gs.i - 1) * 8 + 1 : least(gs.i * 8, len(t))], ' ')
       |          || CASE CAST((doc_id + gs.i - 1) % 5 AS INT)
       |               WHEN 0 THEN '.' WHEN 1 THEN '!' WHEN 2 THEN '?'
       |               WHEN 3 THEN '' ELSE ' javascript.' END AS line
       |        FROM tk, LATERAL (SELECT unnest(generate_series(1,
       |          CAST(ceil(len(t) / 8.0) AS INT))) AS i) gs),
       |pg0 AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS body
       |        FROM ln0 GROUP BY doc_id),
       |pages AS (SELECT d.doc_id, d.lang,
       |            coalesce(p.body, '') || CASE WHEN d.doc_id % 31 = 0
       |              THEN chr(10) || 'lorem ipsum { x }' ELSE '' END AS page
       |          FROM documents d LEFT JOIN pg0 p ON d.doc_id = p.doc_id),
       |r AS (SELECT doc_id, lang, page,
       |        length(page) - length(replace(page, chr(10), '')) + 1 AS n_lines,
       |        list_filter(list_transform(string_split(page, chr(10)),
       |            x -> trim(x, ' ' || chr(9) || chr(12) || chr(13))),
       |          t -> length(t) > 0
       |           AND list_contains(['.', '!', '?', '"'], t[-1:])
       |           AND len(list_filter(string_split_regex(t, '\\s+'), w -> w <> '')) >= 5
       |           AND NOT contains(lower(t), 'javascript')) AS kept
       |      FROM pages),
       |v AS (SELECT lang, n_lines, len(kept) AS n_kept,
       |        (len(kept) >= 3 AND NOT contains(lower(page), 'lorem ipsum')
       |         AND NOT contains(page, '{')) AS page_kept,
       |        length(array_to_string(kept, chr(10))) AS clean_len
       |      FROM r)
       |SELECT lang, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN page_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_pages_kept,
       |       CAST(sum(n_lines) AS BIGINT) AS sum_lines,
       |       CAST(sum(n_kept) AS BIGINT) AS sum_kept_lines,
       |       CAST(sum(CASE WHEN page_kept THEN clean_len ELSE 0 END) AS BIGINT)
       |         AS sum_clean_chars
       |FROM v GROUP BY lang ORDER BY lang""".stripMargin

  /** Shared BM25 oracle CTE chain (tokenize → doc/corpus stats → per-
    * (query-term, doc) contribution → per-(query, doc) score `sc`), with
    * the query-term set `qt(qid, tok)` supplied by the caller — q_bm25
    * retrieves for literal query strings, q_hybrid_rrf for document
    * texts. Mirrors `ops/Bm25.scala` integer arithmetic exactly.
    */
  private def bm25CtesSql(qtCtes: String): String =
    s"""tk AS (SELECT doc_id, $ToksSql AS t FROM documents),
       |nn AS (SELECT doc_id, t, len(t) AS dl FROM tk WHERE len(t) >= 1),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS s FROM nn),
       |tfc AS (SELECT doc_id, tok, count(*) AS tf
       |        FROM (SELECT doc_id, unnest(t) AS tok FROM nn) GROUP BY 1, 2),
       |dfc AS (SELECT tok, count(*) AS df FROM tfc GROUP BY 1),
       |$qtCtes,
       |con AS (SELECT qt.qid, p.doc_id,
       |          CAST(floor(
       |            (CAST(floor(ln(2 * (SELECT n FROM st) + 2) * 1e6 + 0.5) AS BIGINT)
       |             - CAST(floor(ln(2 * p.df + 1) * 1e6 + 0.5) AS BIGINT))
       |            * CAST(22 * (SELECT s FROM st) * p.tf AS DOUBLE)
       |            / CAST(10 * (SELECT s FROM st) * p.tf + 3 * (SELECT s FROM st)
       |                   + 9 * (SELECT n FROM st) * p.dl AS DOUBLE)
       |            + 0.5) AS BIGINT) AS c
       |        FROM (SELECT tfc.doc_id, tfc.tok, tfc.tf, nn.dl, dfc.df
       |              FROM tfc JOIN nn USING (doc_id) JOIN dfc USING (tok)) p
       |        JOIN qt ON p.tok = qt.tok),
       |sc AS (SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS scaled_score
       |       FROM con GROUP BY 1, 2)""".stripMargin

  /** Shared connected-components CTE chain: exact >= 0.8 pair graph →
    * recursive min-label reachability → `sizes(component, sz)` — the
    * q_dup_clusters / q_dup_histogram common prefix.
    */
  private lazy val DupSizesCtesSql =
    s"""WITH RECURSIVE $ShinglePairCtesSql,
       |pairs AS (SELECT ida, idb FROM j WHERE jac >= 0.8),
       |edges AS (SELECT ida AS u, idb AS v FROM pairs
       |          UNION SELECT idb, ida FROM pairs),
       |reach(node, lab) AS (
       |  SELECT DISTINCT u, u FROM edges
       |  UNION
       |  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node
       |  WHERE r.lab < e.v),
       |comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY 1),
       |sizes AS (SELECT component, count(*) AS sz FROM comp GROUP BY 1)""".stripMargin

  /** Naive-Bayes classifier oracle — train on even ids (label lang='en'),
    * score odd ids, aggregate per lang. Shared VERBATIM by
    * q_quality_classifier (batch scoring) and q_streaming_classify
    * (micro-batch scoring under a fixed pre-trained model): the model is
    * fixed and scores are per-doc, so batching must not change a single
    * value — the strongest statement of the batch/streaming contract.
    */
  /** Shared CTE chain ending in `d(lang, oov, sc)` — per-doc integer
    * scores of the odd-id slice under the NB model trained on the even-id
    * slice; consumed by the classifier readout and the calibration sweep.
    */
  private lazy val ClassifierScoredCtesSql =
    s"""tokA AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS l,
       |                     unnest($ToksSql) AS t
       |              FROM documents WHERE doc_id % 2 = 0),
       |vocab AS (SELECT t, CAST(sum(l) AS BIGINT) AS cpos,
       |                 CAST(sum(1 - l) AS BIGINT) AS cneg FROM tokA GROUP BY t),
       |consts AS (SELECT
       |    CAST(floor(ln(coalesce(sum(cpos), 0) + greatest(count(*), 1)) * 1e6 + 0.5) AS BIGINT) AS spden,
       |    CAST(floor(ln(coalesce(sum(cneg), 0) + greatest(count(*), 1)) * 1e6 + 0.5) AS BIGINT) AS snden
       |  FROM vocab),
       |dprior AS (SELECT
       |    CAST(floor(ln(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1) * 1e6 + 0.5) AS BIGINT)
       |  - CAST(floor(ln(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) + 1) * 1e6 + 0.5) AS BIGINT) AS prior
       |  FROM documents WHERE doc_id % 2 = 0),
       |w AS (SELECT t,
       |        CAST(floor(ln(cpos + 1) * 1e6 + 0.5) AS BIGINT) - (SELECT spden FROM consts)
       |      - CAST(floor(ln(cneg + 1) * 1e6 + 0.5) AS BIGINT) + (SELECT snden FROM consts) AS w
       |      FROM vocab),
       |tokB AS (SELECT doc_id, lang, unnest($ToksSql) AS t
       |         FROM documents WHERE doc_id % 2 = 1),
       |scored AS (SELECT b.doc_id, b.lang,
       |             sum(CASE WHEN w.w IS NULL THEN 1 ELSE 0 END) AS oov,
       |             sum(coalesce(w.w, (SELECT snden - spden FROM consts))) AS sw
       |           FROM tokB b LEFT JOIN w USING (t) GROUP BY 1, 2),
       |d AS (SELECT lang, oov, sw + (SELECT prior FROM dprior) AS sc FROM scored)""".stripMargin

  private lazy val QualityClassifierOracleSql =
    s"""WITH $ClassifierScoredCtesSql
       |SELECT lang, count(*) AS n_docs, CAST(sum(sc) AS BIGINT) AS sum_scaled_score,
       |       CAST(sum(CASE WHEN sc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_positive,
       |       CAST(sum(oov) AS BIGINT) AS sum_oov
       |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  /** Exact 3-token-shingle Jaccard >= 0.8 over ALL document pairs, via a
    * shingle inverted-index join — the ground truth both sketch-blocking
    * pipelines (q_minhash_lsh, q_simhash) must reproduce exactly. Mirrors
    * [[graft.functions.TextFunctions.shingles]]: <=3-token docs collapse to
    * one whole-text shingle, shingle sets are distinct.
    */
  /** Shared CTE chain: tk/sh/counts/inter plus `j(ida, idb, jac)` — one row
    * per ordered pair with its exact shingle Jaccard.
    */
  private val ShinglePairCtesSql =
    s"""tk AS (SELECT doc_id, $ToksSql AS t FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    CASE WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
       |         ELSE list_transform(range(len(t)-2),
       |                i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) END)) AS s
       |  FROM tk),
       |counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |j AS (
       |  SELECT ida, idb, i * 1.0 / (ca.n + cb.n - i) AS jac
       |  FROM inter JOIN counts ca ON ida = ca.doc_id JOIN counts cb ON idb = cb.doc_id)""".stripMargin

  private def exactShinglePairsSql(
      countAlias: String, avgAlias: String, extraCols: String = ""): String =
    s"""WITH $ShinglePairCtesSql
       |SELECT count(*) AS $countAlias, floor(avg(jac) * 1000 + 0.5) / 1000 AS $avgAlias$extraCols
       |FROM j WHERE jac >= 0.8""".stripMargin

  /** Shared CTE chain for the SemDeDup oracles: embeddings + the
    * iterations=0 coarse quantizer (cells = the 8 lowest-id vectors,
    * sequential squared-L2 argmin, (dist, cell) tie-break) + the
    * within-cell cosine >= 0.4 pair set — q_semantic_dedup and
    * q_semantic_keepbest differ only in the keep rule applied to
    * `pairs(ida, idb)`.
    */
  private val SemanticPairCtesSql =
    """e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
      |          FROM e ORDER BY vec_id LIMIT 8),
      |d AS (SELECT e.vec_id, c.cell,
      |        list_sum(list_transform(list_zip(e.v, c.v),
      |          p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
      |      FROM e CROSS JOIN cents c),
      |asg AS (SELECT vec_id, cell FROM (
      |          SELECT vec_id, cell,
      |                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk
      |          FROM d)
      |        WHERE rk = 1),
      |pairs AS (SELECT a.vec_id AS ida, b.vec_id AS idb
      |          FROM e a JOIN asg aa ON a.vec_id = aa.vec_id
      |               JOIN asg bb ON aa.cell = bb.cell
      |               JOIN e b ON b.vec_id = bb.vec_id AND a.vec_id < b.vec_id
      |          WHERE list_cosine_similarity(a.v, b.v) >= 0.4)""".stripMargin

  /** Shared quality-score CTEs (`qf` features, `qs(doc_id…, q)`): DuckDB
    * reproduction of [[graft.functions.TextFunctions.qualityScoreRaw]]'s
    * exact 0.5-step composite — used wherever an oracle orders or
    * tie-breaks on quality (q_dedup_keep_best, q_semantic_keepbest).
    * `carrySelect`/`carryNames` thread extra columns (e.g. lang, fp)
    * through both CTEs.
    */
  private def qualityCtesSql(carrySelect: String = "", carryNames: String = ""): String =
    s"""qf AS (
       |  SELECT doc_id$carrySelect,
       |    len($ToksSql) AS n_tok,
       |    (length(text) - length(regexp_replace(text, '[^[:alnum:][:space:]]', '', 'g'))) * 1.0
       |      / greatest(length(text), 1) AS punct_ratio,
       |    list_sum(list_transform($ToksSql, t -> length(t))) * 1.0
       |      / greatest(len($ToksSql), 1) AS mean_wl,
       |    len(list_filter($ToksSql, t -> list_contains(
       |      ['the','a','an','and','or','of','to','in','is','it'], t))) * 1.0
       |      / greatest(len($ToksSql), 1) AS stop_ratio
       |  FROM documents),
       |qs AS (
       |  SELECT doc_id$carryNames,
       |    (CASE WHEN n_tok BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END) +
       |    (CASE WHEN punct_ratio < 0.2 THEN 1.0 ELSE 0.0 END) +
       |    (CASE WHEN mean_wl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) +
       |    (CASE WHEN stop_ratio > 0.0 THEN 1.0 ELSE 0.5 END) AS q
       |  FROM qf)""".stripMargin

  /** The full IVF-PQ re-derivation (coarse 16-cell routing, probe top-4,
    * per-block codebooks/codes, scaled ADC tables, ranked candidates in
    * `r`) — shared by q_embed_ivfpq (reads `r` at k=5) and q_ann_rerank
    * (takes `r` at k=20 as the candidate stage, then exact-reranks).
    */
  private val IvfPqCtesSql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |base AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
      |         FROM e ORDER BY vec_id LIMIT 16),
      |dc AS (SELECT e.vec_id, b.cell,
      |         list_sum(list_transform(list_zip(e.v, b.v),
      |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
      |       FROM e CROSS JOIN base b),
      |casg AS (SELECT vec_id, cell FROM (
      |           SELECT vec_id, cell,
      |                  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk
      |           FROM dc)
      |         WHERE rk = 1),
      |probe AS (SELECT vec_id AS query_id, cell FROM (
      |            SELECT vec_id, cell,
      |                   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk
      |            FROM dc)
      |          WHERE rk <= 4 AND vec_id < 10),
      |blk AS (SELECT unnest(generate_series(0, 3)) AS b),
      |cb AS (SELECT b, cell, v[(b*16+1):(b*16+16)] AS c FROM base CROSS JOIN blk),
      |sub AS (SELECT vec_id, b, v[(b*16+1):(b*16+16)] AS s FROM e CROSS JOIN blk),
      |dpq AS (SELECT sub.vec_id, sub.b, cb.cell,
      |          list_sum(list_transform(list_zip(sub.s, cb.c),
      |            p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
      |        FROM sub JOIN cb ON sub.b = cb.b),
      |pasg AS (SELECT vec_id, b, cell FROM (
      |           SELECT *, row_number() OVER (PARTITION BY vec_id, b ORDER BY dist, cell) AS rk
      |           FROM dpq)
      |         WHERE rk = 1),
      |qt AS (SELECT vec_id AS query_id, b, cell,
      |         CAST(floor(dist * 1e12 + 0.5) AS BIGINT) AS sd
      |       FROM dpq WHERE vec_id < 10),
      |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
      |         FROM casg a JOIN probe p ON a.cell = p.cell AND p.query_id <> a.vec_id),
      |adc AS (SELECT c.query_id, c.neighbor_id, CAST(sum(qt.sd) AS BIGINT) AS scaled_adc
      |        FROM cand c JOIN pasg n ON n.vec_id = c.neighbor_id
      |             JOIN qt ON qt.query_id = c.query_id AND qt.b = n.b AND qt.cell = n.cell
      |        GROUP BY 1, 2),
      |r AS (SELECT query_id, neighbor_id, scaled_adc,
      |        row_number() OVER (PARTITION BY query_id
      |          ORDER BY scaled_adc, neighbor_id) AS rank
      |      FROM adc)""".stripMargin

  /** Exact brute-force top-k aggregate (the ANN queries' oracle side):
    * n_exact / n_queries reproduced exactly; recall_ok is the in-query
    * invariant the approximate side must satisfy.
    */
  private val AnnExactSideSql =
    """SELECT count(*) AS n_exact, count(DISTINCT query_id) AS n_queries, true AS recall_ok
      |FROM (
      |  SELECT q.vec_id AS query_id,
      |         row_number() OVER (PARTITION BY q.vec_id
      |           ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                           CAST(c.embedding AS DOUBLE[])) DESC,
      |                    c.vec_id ASC) AS rank
      |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
      |WHERE rank <= 5""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_log_parse_agg" ->
      """SELECT event_type, count(*) AS n, floor(sum(round(value, 2)) * 100 + 0.5) / 100 AS sum_value,
        |       max(event_id) AS max_event_id
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_log_multiline" ->
      """SELECT event_type, count(*) AS n, floor(sum(round(value, 2)) * 100 + 0.5) / 100 AS sum_value,
        |       max(event_id) AS max_event_id
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_log_apache" ->
      """SELECT CAST(CASE WHEN event_type = 'error' THEN 500 ELSE 200 END AS BIGINT)
        |         AS status,
        |       count(*) AS n,
        |       CAST(sum(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_bytes_null,
        |       CAST(sum(CASE WHEN event_id % 10 <> 0
        |                     THEN CAST(floor("value" * 100) AS BIGINT) END)
        |         AS BIGINT) AS sum_bytes,
        |       count(DISTINCT user_id % 200) AS n_hosts,
        |       CAST(max(hour(ts)) AS BIGINT) AS max_hour
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_log_pushdown" ->
      """SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket, count(*) AS n,
        |       floor(sum(round(value, 2)) * 100 + 0.5) / 100 AS sum_value
        |FROM events WHERE event_type = 'click' AND user_id < 500
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_log_partitioned" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS dt, event_type, count(*) AS n,
        |       max(event_id) AS max_event_id,
        |       CAST(sum(user_id) AS BIGINT) AS sum_user_id
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_log_dircols" ->
      """SELECT strftime(ts, '%d') AS d, event_type, count(*) AS n,
        |       max(event_id) AS max_event_id,
        |       CAST(sum(user_id) AS BIGINT) AS sum_user_id
        |FROM events
        |WHERE strftime(ts, '%d') BETWEEN '08' AND '14'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_log_sqlpath" ->
      """SELECT event_type, count(*) AS n, max(event_id) AS max_event_id,
        |       CAST(sum(user_id) AS BIGINT) AS sum_user_id
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_log_dropmalformed" ->
      """SELECT event_type, count(*) AS n,
        |       floor(sum(round(value, 2)) * 100 + 0.5) / 100 AS sum_value
        |FROM events WHERE event_type <> 'error'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_log_unmatched" ->
      """SELECT count(*) FILTER (WHERE event_type <> 'error') AS n_matched,
        |       count(*) FILTER (WHERE event_type = 'error') AS n_unmatched
        |FROM events""".stripMargin,
    "q_log_typed_dates" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS d, count(*) AS n,
        |       min((date_part('hour', ts) * 3600 + date_part('minute', ts) * 60
        |            + date_part('second', ts)) * 1000) AS min_ms_of_day,
        |       count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY 1 ORDER BY d""".stripMargin,
    "q_log_timestamp" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, count(*) AS n,
        |       strftime(min(date_trunc('second', ts)), '%Y-%m-%d %H:%M:%S') AS min_ts,
        |       strftime(max(date_trunc('second', ts)), '%Y-%m-%d %H:%M:%S') AS max_ts,
        |       min(event_id) AS min_event_id
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin,
    "q_log_failfast" ->
      """SELECT user_id % 10 AS user_bucket, count(*) AS n,
        |       floor(sum(round(value, 2)) * 100 + 0.5) / 100 AS sum_value
        |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin,
    "q_log_gzip" ->
      """SELECT event_type, count(*) AS n,
        |       floor(max(round(value, 2)) * 100 + 0.5) / 100 AS max_value,
        |       CAST(sum(user_id) AS BIGINT) AS sum_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_log_bzip2" ->
      """SELECT event_type, count(*) AS n,
        |       floor(max(round(value, 2)) * 100 + 0.5) / 100 AS max_value,
        |       CAST(sum(user_id) AS BIGINT) AS sum_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_log_stream" ->
      """SELECT event_type, count(*) AS n, CAST(sum(user_id) AS BIGINT) AS sum_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
        |       floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_base,
        |       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS sum_disc,
        |       floor(avg(l_quantity) * 10000 + 0.5) / 10000 AS avg_qty, count(*) AS n
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1 - l_discount) AS net
        |FROM lineitem WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber LIMIT 200""".stripMargin,
    "q_join_broadcast" ->
      """SELECT p_brand, count(*) AS n, floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_join_5way" ->
      """SELECT r_name, n_name,
        |       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS revenue, count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n, floor(sum(c_acctbal) * 100 + 0.5) / 100 AS sum_bal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_window_topk" ->
      """SELECT o_custkey, rk, o_orderkey, price FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice AS price,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q_window_lag" ->
      """SELECT l_suppkey, count(gap_days) AS n_gaps,
        |       floor(avg(gap_days) * 10000 + 0.5) / 10000 AS avg_gap, max(gap_days) AS max_gap
        |FROM (
        |  SELECT l_suppkey,
        |         datediff('day',
        |           lag(l_shipdate) OVER (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC),
        |           l_shipdate) AS gap_days
        |  FROM lineitem)
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |       count(*) AS n, floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st, coalesce(o_orderpriority, 'ALL') AS pr,
        |       count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY st, pr""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st, coalesce(o_orderpriority, 'ALL') AS pr,
        |       count(*) AS n, floor(sum(o_totalprice) * 100 + 0.5) / 100 AS sum_price
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY st, pr""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS n_k,
        |       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_supplier_topk" ->
      """SELECT s_name, n_name,
        |       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY s_name, n_name ORDER BY revenue DESC, s_name LIMIT 10""".stripMargin,
    "q_session_window" ->
      """WITH b AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |         ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM b),
        |per AS (SELECT user_id, sid, count(*) AS n_events FROM sess GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        |       CAST(sum(n_events) AS BIGINT) AS n_events,
        |       max(n_events) AS max_session_events
        |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_distinct_agg" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n,
        |       floor(sum(o_totalprice) * 100 + 0.5) / 100 AS sum_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        |       floor(quantile_cont(l_extendedprice, 0.5) * 10000 + 0.5) / 10000 AS p50,
        |       floor(quantile_cont(l_extendedprice, 0.95) * 10000 + 0.5) / 10000 AS p95,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_approx_percentile" ->
      """SELECT l_returnflag,
        |       floor(quantile_cont(l_extendedprice, 0.5) * 10000 + 0.5) / 10000 AS exact_p50,
        |       count(*) AS n, true AS within_rank_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_heavy_hitters" ->
      """SELECT user_id, count(*) AS n, true AS cms_ok
        |FROM events GROUP BY user_id
        |ORDER BY n DESC, user_id LIMIT 10""".stripMargin,
    "q_heavy_hitters_docs" ->
      """SELECT source, count(*) AS n, true AS cms_ok
        |FROM documents GROUP BY source
        |ORDER BY n DESC, source LIMIT 10""".stripMargin,
    "q_url_extract" ->
      """WITH u AS (
        |  SELECT printf('https://site-%d.example.org/%s/doc-%d?ref=%d',
        |                doc_id % 20, lang, doc_id, doc_id % 7) AS url
        |  FROM documents),
        |p AS (SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
        |             regexp_extract(url, '\?(.*)$', 1) AS query FROM u)
        |SELECT host, count(*) AS n, count(DISTINCT query) AS n_refs
        |FROM p GROUP BY host ORDER BY host""".stripMargin,
    "q_url_canonical" ->
      """WITH c AS (
        |  SELECT lang, printf('https://site-%d.example.org/%s/doc-%d?p=%d&q=%d',
        |                      doc_id % 20, lang, doc_id % 100,
        |                      doc_id % 5, doc_id % 4) AS curl
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs, count(DISTINCT curl) AS n_canonical,
        |       min(curl) AS min_curl, max(curl) AS max_curl
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin,
    "q_event_anomaly" ->
      """WITH h AS (
        |  SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, n,
        |         sum(n) OVER (PARTITION BY event_type) AS tot,
        |         count(*) OVER (PARTITION BY event_type) AS nh
        |  FROM h)
        |SELECT event_type, count(*) AS n_anomalous_hours, max(n) AS max_hourly
        |FROM s WHERE n * nh >= tot * 2 GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_doc_anomaly" ->
      """WITH h AS (
        |  SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
        |s AS (
        |  SELECT lang, n,
        |         sum(n) OVER (PARTITION BY lang) AS tot,
        |         count(*) OVER (PARTITION BY lang) AS ns
        |  FROM h)
        |SELECT lang,
        |       CAST(sum(CASE WHEN n * ns >= tot * 2 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_hot_sources,
        |       max(n) AS max_n
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin,
    "q_observe" ->
      """SELECT count(*) AS n_rows, CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |       floor(max(l_extendedprice) * 100 + 0.5) / 100 AS max_price
        |FROM lineitem WHERE l_quantity >= 25""".stripMargin,
    "q_typed_agg" ->
      """SELECT l_returnflag,
        |       CAST(sum(CAST(l_quantity AS BIGINT) *
        |                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) //
        |            sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w_price_cents
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_multi_distinct" ->
      """SELECT o_orderpriority,
        |       count(DISTINCT o_custkey) AS n_cust,
        |       count(DISTINCT strftime(o_orderdate, '%Y-%m')) AS n_months,
        |       count(DISTINCT o_orderstatus) AS n_status,
        |       count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_gap_fill" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(hour) AS h0, max(hour) AS h1 FROM h GROUP BY 1),
        |spine AS (
        |  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |  FROM b)
        |SELECT s.event_type, count(*) AS n_hours,
        |       CAST(sum(CASE WHEN h.n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_hours,
        |       CAST(sum(coalesce(h.n, 0)) AS BIGINT) AS n_events
        |FROM spine s LEFT JOIN h ON s.event_type = h.event_type AND s.hour = h.hour
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_mad_outliers" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, quantile_cont(n, 0.5) AS med FROM h GROUP BY 1),
        |d AS (SELECT h.event_type, h.n, m.med,
        |             CAST(abs(h.n - m.med) * 4 AS BIGINT) AS dev4
        |      FROM h JOIN m USING (event_type)),
        |md AS (SELECT event_type, CAST(quantile_cont(dev4, 0.5) * 2 AS BIGINT) AS mad8
        |       FROM d GROUP BY 1)
        |SELECT d.event_type, count(*) AS n_hours,
        |       CAST(sum(CASE WHEN d.dev4 * 2 > md.mad8 * 3 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_outlier_hours,
        |       CAST(max(d.med) * 2 AS BIGINT) AS med2,
        |       max(md.mad8) AS mad8
        |FROM d JOIN md USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_interval_coverage" ->
      """WITH iv AS (
        |  SELECT event_type, s, e FROM (
        |    SELECT event_type, epoch_us(ts) AS s,
        |           epoch_us(ts) + 1000000
        |             + CAST(floor("value" * 100000) AS BIGINT) AS e
        |    FROM events)
        |  WHERE s < e),
        |sw AS (
        |  SELECT event_type, s, e,
        |         max(e) OVER (PARTITION BY event_type ORDER BY s, e
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM iv)
        |SELECT event_type,
        |       CAST(sum(greatest(0, e - greatest(s, coalesce(pm, s)))) AS BIGINT)
        |         AS covered_us
        |FROM sw GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cdc_apply" ->
      """WITH base AS (
        |  SELECT user_id, event_type, "value" FROM (
        |    SELECT user_id, event_type, "value",
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id) AS rn
        |    FROM events WHERE event_type = 'signup') WHERE rn = 1),
        |lg AS (
        |  SELECT user_id, ts, event_id, event_type, "value",
        |         CASE WHEN event_type = 'error' THEN 'delete'
        |              ELSE 'upsert' END AS op
        |  FROM events WHERE event_type <> 'signup'),
        |last AS (
        |  SELECT user_id, op, event_type, "value" FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn FROM lg) WHERE rn = 1),
        |fin AS (
        |  SELECT coalesce(l.user_id, b.user_id) AS user_id,
        |         CASE WHEN l.user_id IS NULL THEN b.event_type
        |              ELSE l.event_type END AS event_type,
        |         CASE WHEN l.user_id IS NULL THEN b."value"
        |              ELSE l."value" END AS v
        |  FROM base b FULL JOIN last l ON b.user_id = l.user_id
        |  WHERE l.user_id IS NULL OR l.op <> 'delete')
        |SELECT event_type, count(*) AS n_users,
        |       CAST(sum(CAST(floor(v * 1000000) AS BIGINT)) AS BIGINT)
        |         AS sum_value_u
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical content to q_cdc_apply's oracle BY DESIGN: the sequential
    // per-batch fold must land on the same final snapshot as the one-shot
    // batch compaction
    "q_streaming_cdc" ->
      """WITH base AS (
        |  SELECT user_id, event_type, "value" FROM (
        |    SELECT user_id, event_type, "value",
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id) AS rn
        |    FROM events WHERE event_type = 'signup') WHERE rn = 1),
        |lg AS (
        |  SELECT user_id, ts, event_id, event_type, "value",
        |         CASE WHEN event_type = 'error' THEN 'delete'
        |              ELSE 'upsert' END AS op
        |  FROM events WHERE event_type <> 'signup'),
        |last AS (
        |  SELECT user_id, op, event_type, "value" FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn FROM lg) WHERE rn = 1),
        |fin AS (
        |  SELECT coalesce(l.user_id, b.user_id) AS user_id,
        |         CASE WHEN l.user_id IS NULL THEN b.event_type
        |              ELSE l.event_type END AS event_type,
        |         CASE WHEN l.user_id IS NULL THEN b."value"
        |              ELSE l."value" END AS v
        |  FROM base b FULL JOIN last l ON b.user_id = l.user_id
        |  WHERE l.user_id IS NULL OR l.op <> 'delete')
        |SELECT event_type, count(*) AS n_users,
        |       CAST(sum(CAST(floor(v * 1000000) AS BIGINT)) AS BIGINT)
        |         AS sum_value_u
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pseudonymize" ->
      """WITH ev AS (
        |  SELECT substr(md5('s9:' || CAST(user_id AS VARCHAR)), 1, 16) AS p,
        |         event_type
        |  FROM events),
        |cust AS (
        |  SELECT DISTINCT substr(md5('s9:' || CAST(o_custkey AS VARCHAR)), 1, 16) AS p
        |  FROM orders)
        |SELECT event_type, count(*) AS n_matched,
        |       count(DISTINCT ev.p) AS n_pseudonyms
        |FROM ev JOIN cust ON ev.p = cust.p
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_transform_state" ->
      """WITH per AS (
        |  SELECT user_id, count(*) AS n_events,
        |         CAST(sum(CAST(floor("value" * 1000000) AS BIGINT)) AS BIGINT)
        |           AS total_u
        |  FROM events GROUP BY 1)
        |SELECT n_events, count(*) AS n_users,
        |       CAST(sum(total_u) AS BIGINT) AS sum_total_u
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_time_weighted" ->
      """WITH h AS (
        |  SELECT event_type, "value",
        |         (lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |            ORDER BY ts, event_id) - epoch_us(ts)) // 1000000 AS gap_s
        |  FROM events),
        |v AS (SELECT event_type, CAST(floor("value" * 100) AS BIGINT) AS vc, gap_s
        |      FROM h WHERE gap_s IS NOT NULL),
        |m AS (SELECT event_type, count(*) AS n_held,
        |             CAST(sum(vc * gap_s) AS BIGINT) AS num_cs,
        |             CAST(sum(gap_s) AS BIGINT) AS den_s
        |      FROM v GROUP BY 1)
        |SELECT event_type, n_held, num_cs, den_s,
        |       CASE WHEN den_s > 0 THEN
        |         CAST((num_cs // den_s) * 1000000
        |              + (num_cs % den_s) * 1000000 // den_s AS BIGINT) END
        |         AS twa_cppm
        |FROM m ORDER BY 1""".stripMargin,
    "q_streaks" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS rn,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |           ORDER BY ts, event_id) AS rnt
        |  FROM events),
        |isl AS (SELECT user_id, event_type, rn - rnt AS island,
        |               CAST(count(*) AS BIGINT) AS len
        |        FROM r GROUP BY 1, 2, 3),
        |best AS (SELECT user_id, len AS best_len, event_type AS best_type FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY len DESC, event_type ASC, island ASC) AS rk
        |  FROM isl) WHERE rk = 1)
        |SELECT best_type AS event_type, count(*) AS n_users,
        |       max(best_len) AS max_streak,
        |       CAST(sum(best_len) AS BIGINT) AS sum_streak
        |FROM best GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_trend" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(hour) AS h0 FROM h GROUP BY 1),
        |xy AS (
        |  SELECT h.event_type,
        |         (epoch_us(h.hour) - epoch_us(b.h0)) // 3600000000 AS x, y
        |  FROM h JOIN b USING (event_type)),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |             CAST(sum(x * x) AS BIGINT) AS sxx,
        |             CAST(sum(x * y) AS BIGINT) AS sxy
        |      FROM xy GROUP BY 1)
        |SELECT event_type, n,
        |       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
        |       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
        |       CASE WHEN n * sxx - sx * sx > 0
        |            THEN CAST((n * sxy - sx * sy) * 1000000
        |                      // (n * sxx - sx * sx) AS BIGINT) END AS slope_ppm
        |FROM m ORDER BY event_type""".stripMargin,
    "q_chi2" ->
      """WITH ev AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod FROM events),
        |o AS (SELECT event_type, hod, CAST(count(*) AS BIGINT) AS o
        |      FROM ev GROUP BY 1, 2),
        |r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
        |c AS (SELECT hod, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS t FROM o),
        |cells AS (
        |  SELECT o.event_type,
        |         CAST(o.o AS DOUBLE) * t.t - CAST(r.r AS DOUBLE) * c.c AS d,
        |         CAST(r.r AS DOUBLE) * c.c * t.t AS den
        |  FROM o JOIN r USING (event_type) JOIN c USING (hod) CROSS JOIN t)
        |SELECT event_type, count(*) AS n_cells,
        |       CAST(sum(CAST(floor(1000000.0 * d * d / den) AS BIGINT)) AS BIGINT)
        |         AS chi2_u
        |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pivot" ->
      """SELECT CAST(hour(ts) AS BIGINT) AS hod,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_funnel" ->
      """WITH c AS (
        |  SELECT user_id, min(ts) AS c0 FROM events WHERE event_type = 'click' GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS p0
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND e.ts >= c.c0 AND e.ts <= c.c0 + INTERVAL 7 DAY
        |  GROUP BY 1)
        |SELECT CAST(CAST(c.c0 AS DATE) AS VARCHAR) AS cohort_day,
        |       count(*) AS n_clickers,
        |       CAST(sum(CASE WHEN p.p0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
        |       CAST(sum(CASE WHEN p.p0 IS NOT NULL
        |                THEN (epoch_us(p.p0) - epoch_us(c.c0)) // 60000000
        |                ELSE 0 END) AS BIGINT) AS sum_gap_min
        |FROM c LEFT JOIN p ON c.user_id = p.user_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cohort_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
        |f AS (SELECT user_id, min(wk) AS cw FROM a GROUP BY 1),
        |x AS (SELECT a.user_id, date_diff('day', f.cw, a.wk) // 7 AS off, f.cw
        |      FROM a JOIN f ON a.user_id = f.user_id)
        |SELECT CAST(CAST(cw AS DATE) AS VARCHAR) AS cohort_week,
        |       count(DISTINCT CASE WHEN off = 0 THEN user_id END) AS w0,
        |       count(DISTINCT CASE WHEN off = 1 THEN user_id END) AS w1,
        |       count(DISTINCT CASE WHEN off = 2 THEN user_id END) AS w2,
        |       count(DISTINCT CASE WHEN off = 3 THEN user_id END) AS w3
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_itemsets" ->
      """WITH bi AS (
        |  SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |nb AS (SELECT count(DISTINCT basket) AS n_baskets FROM bi),
        |s AS (SELECT item, count(*) AS supp FROM bi GROUP BY 1),
        |f AS (SELECT s.item, s.supp FROM s CROSS JOIN nb
        |      WHERE s.supp * 200 >= nb.n_baskets),
        |fbi AS (SELECT bi.basket, bi.item FROM bi JOIN f USING (item)),
        |pr AS (
        |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS pair_supp
        |  FROM fbi a JOIN fbi b ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2),
        |pf AS (SELECT pr.* FROM pr CROSS JOIN nb
        |       WHERE pr.pair_supp * 200 >= nb.n_baskets)
        |SELECT pf.item_a, pf.item_b, pf.pair_supp,
        |       sa.supp AS supp_a, sb.supp AS supp_b,
        |       (1000000 * pf.pair_supp) // sa.supp AS conf_ppm,
        |       (1000000 * nb.n_baskets * pf.pair_supp) // (sa.supp * sb.supp)
        |         AS lift_ppm
        |FROM pf JOIN f sa ON pf.item_a = sa.item
        |        JOIN f sb ON pf.item_b = sb.item
        |        CROSS JOIN nb
        |ORDER BY pf.pair_supp DESC, pf.item_a, pf.item_b LIMIT 20""".stripMargin,
    "q_markov" ->
      """WITH t AS (
        |  SELECT user_id, event_type AS cur,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT prev, cur, count(*) AS n
        |      FROM t WHERE prev IS NOT NULL GROUP BY 1, 2),
        |rt AS (SELECT prev, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT c.prev, c.cur, c.n, rt.tot, (1000000 * c.n) // rt.tot AS p_ppm
        |FROM c JOIN rt ON c.prev = rt.prev
        |ORDER BY 1, 2""".stripMargin,
    "q_fuzzy_match" ->
      """WITH n AS (
        |  SELECT DISTINCT p_name, str_split(p_name, ' ')[-1] AS block FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM n a JOIN n b ON a.block = b.block AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY 1, 2""".stripMargin,
    "q_entity_clusters" ->
      """WITH RECURSIVE names AS (
        |  SELECT p_name, CAST(min(p_partkey) AS BIGINT) AS nid
        |  FROM part GROUP BY 1),
        |p0 AS (
        |  SELECT a.nid AS ida, b.nid AS idb
        |  FROM names a JOIN names b
        |    ON str_split(a.p_name, ' ')[-1] = str_split(b.p_name, ' ')[-1]
        |   AND a.p_name < b.p_name
        |  WHERE levenshtein(a.p_name, b.p_name) <= 3),
        |edges AS (SELECT ida AS u, idb AS v FROM p0 UNION SELECT idb, ida FROM p0),
        |reach(node, lab) AS (
        |  SELECT DISTINCT u, u FROM edges
        |  UNION
        |  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node
        |  WHERE r.lab < e.v),
        |comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY 1),
        |allc AS (
        |  SELECT n.nid AS node, coalesce(c.component, n.nid) AS component
        |  FROM names n LEFT JOIN comp c ON n.nid = c.node),
        |cl AS (SELECT component, count(*) AS cluster_size FROM allc GROUP BY 1)
        |SELECT r.p_name AS rep_name, cl.cluster_size,
        |       CAST(cl.component AS BIGINT) AS component
        |FROM cl JOIN names r ON cl.component = r.nid
        |ORDER BY 1""".stripMargin,
    "q_winsorize" ->
      """WITH d AS (SELECT lang, doc_id, n_chars FROM documents),
        |r AS (SELECT lang, doc_id, n_chars,
        |             row_number() OVER (PARTITION BY lang
        |               ORDER BY n_chars, doc_id) AS rn,
        |             count(*) OVER (PARTITION BY lang) AS n
        |      FROM d),
        |b AS (SELECT lang,
        |             max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
        |                 THEN n_chars END) AS lo,
        |             max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
        |                 THEN n_chars END) AS hi
        |      FROM r GROUP BY 1)
        |SELECT d.lang, count(*) AS n_docs, min(b.lo) AS lo, min(b.hi) AS hi,
        |       CAST(sum(d.n_chars) AS BIGINT) AS sum_raw,
        |       CAST(sum(greatest(b.lo, least(b.hi, d.n_chars))) AS BIGINT)
        |         AS sum_clipped,
        |       CAST(sum(CASE WHEN d.n_chars <> greatest(b.lo, least(b.hi, d.n_chars))
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
        |FROM d JOIN b ON d.lang = b.lang
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cusum" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |d AS (
        |  SELECT event_type, h, y,
        |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
        |           AS BIGINT) AS k,
        |         CAST(sum(y) OVER (PARTITION BY event_type ORDER BY h)
        |           AS BIGINT) AS cum,
        |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |         CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS s
        |  FROM h),
        |v AS (SELECT event_type, h, n, s, n * cum - k * s AS dev FROM d),
        |m AS (SELECT event_type, max(abs(dev)) AS mx FROM v GROUP BY 1)
        |SELECT v.event_type, max(v.n) AS n_hours, max(v.s) AS n_events,
        |       max(m.mx) AS max_abs_dev,
        |       strftime(min(CASE WHEN abs(v.dev) = m.mx THEN v.h END),
        |                '%Y-%m-%d %H:%M:%S') AS change_hour
        |FROM v JOIN m ON v.event_type = m.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_source_gini" ->
      """WITH r AS (
        |  SELECT lang, n_chars,
        |         CAST(row_number() OVER (PARTITION BY lang
        |           ORDER BY n_chars, doc_id) AS BIGINT) AS i
        |  FROM documents),
        |a AS (SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS s,
        |             CAST(sum(i * n_chars) AS BIGINT) AS ix
        |      FROM r GROUP BY 1)
        |SELECT lang, n, s,
        |       2 * ix - (n + 1) * s AS gini_num,
        |       n * s AS gini_den,
        |       (1000000 * (2 * ix - (n + 1) * s)) // (n * s) AS gini_ppm
        |FROM a ORDER BY 1""".stripMargin,
    "q_kappa" ->
      """WITH d AS (
        |  SELECT lang,
        |         CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS a,
        |         CASE WHEN len(regexp_extract_all(text, '[A-Za-z]+')) >= 80
        |              THEN 1 ELSE 0 END AS b
        |  FROM documents),
        |ct AS (
        |  SELECT lang,
        |         CAST(sum(a * b) AS BIGINT) AS n11,
        |         CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
        |         CAST(sum((1 - a) * b) AS BIGINT) AS n01,
        |         CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
        |  FROM d GROUP BY 1),
        |k AS (
        |  SELECT lang, n11, n10, n01, n00,
        |         n11 + n10 + n01 + n00 AS n,
        |         (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS pe_num
        |  FROM ct)
        |SELECT lang, n11, n10, n01, n00, n,
        |       (1000000 * (n * (n11 + n00) - pe_num)) // (n * n - pe_num)
        |         AS kappa_ppm
        |FROM k ORDER BY lang""".stripMargin,
    "q_acf" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         epoch_us(date_trunc('day', ts)) // 86400000000 AS di,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(y) AS BIGINT) AS s
        |       FROM daily GROUP BY 1),
        |dev AS (
        |  SELECT d.event_type, d.di, st.n * d.y - st.s AS z
        |  FROM daily d JOIN st USING (event_type)),
        |den AS (SELECT event_type, max(n) AS n_days, CAST(sum(z * z) AS BIGINT) AS den
        |        FROM dev JOIN st USING (event_type) GROUP BY 1),
        |num AS (
        |  SELECT a.event_type, l.lag,
        |         CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(sum(a.z * b.z) AS BIGINT) AS num
        |  FROM dev a
        |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS lag) l
        |  JOIN dev b ON b.event_type = a.event_type AND b.di = a.di + l.lag
        |  GROUP BY 1, 2)
        |SELECT num.event_type, CAST(num.lag AS BIGINT) AS lag, den.n_days,
        |       num.n_pairs, (1000000 * num.num) // den.den AS acf_ppm
        |FROM num JOIN den USING (event_type)
        |ORDER BY event_type, lag""".stripMargin,
    "q_mann_whitney" ->
      """WITH hist AS (
        |  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS m
        |  FROM documents
        |  WHERE source IN ('src0','src1','src2','src3','src4')
        |  GROUP BY 1, 2),
        |prs AS (
        |  SELECT a.source AS s1, b.source AS s2
        |  FROM (SELECT DISTINCT source FROM hist) a,
        |       (SELECT DISTINCT source FROM hist) b
        |  WHERE a.source < b.source),
        |ph AS (
        |  SELECT s1, s2, n_chars, CAST(sum(m1) AS BIGINT) AS m1,
        |         CAST(sum(m2) AS BIGINT) AS m2
        |  FROM (
        |    SELECT p.s1, p.s2, h.n_chars, h.m AS m1, 0 AS m2
        |    FROM prs p JOIN hist h ON h.source = p.s1
        |    UNION ALL
        |    SELECT p.s1, p.s2, h.n_chars, 0, h.m
        |    FROM prs p JOIN hist h ON h.source = p.s2)
        |  GROUP BY 1, 2, 3),
        |rk AS (
        |  SELECT s1, s2, m1, m2,
        |         2 * (sum(m1 + m2) OVER (PARTITION BY s1, s2 ORDER BY n_chars)
        |              - (m1 + m2)) + (m1 + m2) + 1 AS r2
        |  FROM ph),
        |ag AS (
        |  SELECT s1, s2, CAST(sum(m1) AS BIGINT) AS n1,
        |         CAST(sum(m2) AS BIGINT) AS n2,
        |         CAST(sum(m1 * r2) AS BIGINT) AS r1x2
        |  FROM rk GROUP BY 1, 2)
        |SELECT s1, s2, n1, n2, r1x2 - n1 * (n1 + 1) AS u1x2,
        |       (1000000 * (r1x2 - n1 * (n1 + 1))) // (2 * n1 * n2) AS auc_ppm
        |FROM ag ORDER BY s1, s2""".stripMargin,
    "q_link_predict" ->
      """WITH raw AS (
        |  SELECT 'site-' || CAST(doc_id % 20 AS VARCHAR) AS src,
        |         'site-' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst
        |  FROM documents WHERE doc_id % 20 < 17
        |  UNION ALL
        |  SELECT 'site-' || CAST(doc_id % 20 AS VARCHAR),
        |         'site-' || CAST((doc_id * 3 + 5) % 20 AS VARCHAR)
        |  FROM documents WHERE doc_id % 20 < 17 AND (doc_id % 20) % 3 = 0),
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |  FROM raw WHERE src <> dst),
        |adj AS (
        |  SELECT u AS z, v AS x FROM und
        |  UNION ALL SELECT v AS z, u AS x FROM und),
        |deg AS (SELECT z, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY 1),
        |wedges AS (
        |  SELECT a.x AS a, b.x AS b,
        |         CAST(floor(ln(deg.d) * 1000000 + 0.5) AS BIGINT) AS sln
        |  FROM adj a JOIN adj b ON b.z = a.z AND a.x < b.x
        |  JOIN deg ON deg.z = a.z),
        |scored AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS cn,
        |         CAST(sum(1000000000000 // sln) AS BIGINT) AS aa_u
        |  FROM wedges GROUP BY 1, 2)
        |SELECT a, b, cn, aa_u FROM scored
        |WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.u = scored.a
        |                                      AND und.v = scored.b)
        |ORDER BY cn DESC, aa_u DESC, a, b LIMIT 10""".stripMargin,
    "q_flesch" ->
      """WITH c AS (
        |  SELECT lang,
        |         greatest(len(regexp_extract_all(text, '[A-Za-z]+')), 1) AS w,
        |         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS sents,
        |         greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
        |           AS syl
        |  FROM documents),
        |s AS (
        |  SELECT lang, CAST(w AS BIGINT) AS w, CAST(sents AS BIGINT) AS sents,
        |         CAST(syl AS BIGINT) AS syl,
        |         206835 - (1015 * CAST(w AS BIGINT)) // CAST(sents AS BIGINT)
        |                - (84600 * CAST(syl AS BIGINT)) // CAST(w AS BIGINT)
        |           AS score_milli
        |  FROM c)
        |SELECT lang, count(*) AS n_docs, CAST(sum(w) AS BIGINT) AS n_words,
        |       CAST(sum(syl) AS BIGINT) AS n_syllables,
        |       CAST(sum(score_milli) AS BIGINT) // count(*) AS avg_score_milli,
        |       min(score_milli) AS min_score_milli,
        |       max(score_milli) AS max_score_milli
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin,
    "q_mmr_diversify" ->
      """WITH cand AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                CAST(q.embedding AS DOUBLE[])) AS rel,
        |         CAST(c.embedding AS DOUBLE[]) AS cv,
        |         row_number() OVER (PARTITION BY q.vec_id
        |           ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                           CAST(q.embedding AS DOUBLE[])) DESC,
        |                    c.vec_id ASC) AS rk
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id < 3 AND q.vec_id <> c.vec_id),
        |c8 AS (SELECT query_id, neighbor_id, rel, cv FROM cand WHERE rk <= 8),
        |s1 AS (SELECT query_id, neighbor_id, cv FROM (
        |        SELECT query_id, neighbor_id, cv,
        |               row_number() OVER (PARTITION BY query_id
        |                 ORDER BY 0.7 * rel DESC, neighbor_id ASC) AS rn FROM c8)
        |       WHERE rn = 1),
        |r2 AS (SELECT c.query_id, c.neighbor_id, c.rel, c.cv,
        |              0.7 * c.rel - (1 - CAST(0.7 AS DOUBLE))
        |                * list_cosine_similarity(c.cv, s.cv) AS score
        |       FROM c8 c JOIN s1 s ON s.query_id = c.query_id
        |       WHERE c.neighbor_id <> s.neighbor_id),
        |s2 AS (SELECT query_id, neighbor_id, cv FROM (
        |        SELECT query_id, neighbor_id, cv,
        |               row_number() OVER (PARTITION BY query_id
        |                 ORDER BY score DESC, neighbor_id ASC) AS rn FROM r2)
        |       WHERE rn = 1),
        |r3 AS (SELECT c.query_id, c.neighbor_id,
        |              0.7 * c.rel - (1 - CAST(0.7 AS DOUBLE)) * greatest(
        |                list_cosine_similarity(c.cv, a.cv),
        |                list_cosine_similarity(c.cv, b.cv)) AS score
        |       FROM c8 c JOIN s1 a ON a.query_id = c.query_id
        |                 JOIN s2 b ON b.query_id = c.query_id
        |       WHERE c.neighbor_id <> a.neighbor_id
        |         AND c.neighbor_id <> b.neighbor_id),
        |s3 AS (SELECT query_id, neighbor_id FROM (
        |        SELECT query_id, neighbor_id,
        |               row_number() OVER (PARTITION BY query_id
        |                 ORDER BY score DESC, neighbor_id ASC) AS rn FROM r3)
        |       WHERE rn = 1)
        |SELECT query_id, CAST(1 AS BIGINT) AS step, neighbor_id FROM s1
        |UNION ALL SELECT query_id, CAST(2 AS BIGINT), neighbor_id FROM s2
        |UNION ALL SELECT query_id, CAST(3 AS BIGINT), neighbor_id FROM s3
        |ORDER BY query_id, step""".stripMargin,
    "q_rake_keywords" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |         unnest(regexp_extract_all(lower(text), '[a-z]+|[.,;:!?]'))
         |           AS tok,
         |         unnest(generate_series(1,
         |           len(regexp_extract_all(lower(text), '[a-z]+|[.,;:!?]'))))
         |           AS pos
         |  FROM documents),
         |m AS (SELECT doc_id, pos, tok,
         |             (tok IN ($RakeStopSql)
         |              OR regexp_matches(tok, '^[.,;:!?]$$')) AS stop
         |      FROM toks),
         |g AS (SELECT doc_id, pos, tok, stop,
         |             sum(CASE WHEN stop THEN 1 ELSE 0 END)
         |               OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |      FROM m),
         |words AS (SELECT doc_id, grp, pos, tok FROM g WHERE NOT stop),
         |plen AS (SELECT doc_id, grp, count(*) AS plen
         |         FROM words GROUP BY 1, 2),
         |ws AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq,
         |              CAST(sum(plen) AS BIGINT) AS deg
         |       FROM words JOIN plen USING (doc_id, grp) GROUP BY tok),
         |wsc AS (SELECT tok, (1000000 * deg) // freq AS wscore FROM ws),
         |ph AS (SELECT w.doc_id, w.grp,
         |              string_agg(w.tok, ' ' ORDER BY w.pos) AS phrase,
         |              count(*) AS n_words,
         |              CAST(sum(wsc.wscore) AS BIGINT) AS score_u
         |       FROM words w JOIN wsc ON wsc.tok = w.tok
         |       GROUP BY 1, 2)
         |SELECT phrase, max(n_words) AS n_words, count(*) AS n_occurrences,
         |       max(score_u) AS score_u
         |FROM ph GROUP BY phrase
         |ORDER BY score_u DESC, phrase LIMIT 10""".stripMargin,
    "q_range_shards" ->
      """WITH hist AS (
        |  SELECT n_chars, CAST(count(*) AS BIGINT) AS m
        |  FROM documents GROUP BY 1),
        |cum AS (
        |  SELECT n_chars, m,
        |         CAST(sum(m) OVER (ORDER BY n_chars) AS BIGINT) AS cum,
        |         CAST((SELECT sum(m) FROM hist) AS BIGINT) AS n
        |  FROM hist),
        |bounds AS (
        |  SELECT k.shard, min(c.n_chars) AS hi_bound
        |  FROM cum c CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS shard) k
        |  WHERE c.cum >= (k.shard * c.n + 7) // 8
        |  GROUP BY 1),
        |assigned AS (
        |  SELECT h.n_chars, h.m, min(b.shard) AS shard
        |  FROM hist h JOIN bounds b ON h.n_chars <= b.hi_bound
        |  GROUP BY 1, 2)
        |SELECT a.shard, b.hi_bound, CAST(sum(a.m) AS BIGINT) AS n_rows,
        |       min(a.n_chars) AS lo, max(a.n_chars) AS hi,
        |       CAST(sum(a.m * a.n_chars) AS BIGINT) AS sum_chars
        |FROM assigned a JOIN bounds b USING (shard)
        |GROUP BY 1, 2 ORDER BY shard""".stripMargin,
    "q_burstiness" ->
      """WITH g AS (
        |  SELECT event_type, epoch_us(ts) AS us,
        |         lead(epoch_us(ts)) OVER (PARTITION BY event_type
        |           ORDER BY ts, event_id) AS next_us
        |  FROM events),
        |d AS (SELECT event_type, (next_us - us) // 1000000 AS d
        |      FROM g WHERE next_us IS NOT NULL),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |             CAST(sum(d) AS BIGINT) AS s, CAST(sum(d * d) AS BIGINT) AS q
        |      FROM d GROUP BY 1)
        |SELECT event_type, n_gaps, s, s // n_gaps AS mean_gap_s,
        |       CAST(floor((CAST(n_gaps AS DOUBLE) * q - CAST(s AS DOUBLE) * s)
        |                  * 1000000.0 / (CAST(s AS DOUBLE) * s)) AS BIGINT)
        |         AS cv2_ppm
        |FROM m ORDER BY event_type""".stripMargin,
    "q_centroid_classify" ->
      """WITH vecs AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |         unnest(generate_series(0, len(embedding) - 1)) AS pos,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
        |              AS BIGINT) AS xq
        |  FROM embeddings),
        |cents AS (
        |  SELECT label AS clabel, pos,
        |         CAST(sum(xq) AS BIGINT) // count(*) AS c
        |  FROM vecs GROUP BY 1, 2),
        |dists AS (
        |  SELECT v.vec_id, v.label, ct.clabel,
        |         CAST(sum((v.xq - ct.c) * (v.xq - ct.c)) AS BIGINT) AS d2
        |  FROM vecs v JOIN cents ct ON ct.pos = v.pos
        |  GROUP BY 1, 2, 3),
        |preds AS (
        |  SELECT vec_id, label, clabel AS pred
        |  FROM (SELECT vec_id, label, clabel,
        |               row_number() OVER (PARTITION BY vec_id
        |                 ORDER BY d2, clabel) AS rn
        |        FROM dists)
        |  WHERE rn = 1)
        |SELECT label, pred, count(*) AS n
        |FROM preds GROUP BY 1, 2 ORDER BY label, pred""".stripMargin,
    "q_time_travel" ->
      """WITH cut AS (SELECT min(ts) + INTERVAL 20 DAY AS cut FROM events),
        |ev AS (SELECT e.* FROM events e, cut WHERE e.ts <= cut.cut),
        |base AS (
        |  SELECT user_id, event_type, "value" FROM (
        |    SELECT user_id, event_type, "value",
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id) AS rn
        |    FROM ev WHERE event_type = 'signup') WHERE rn = 1),
        |lg AS (
        |  SELECT user_id, ts, event_id, event_type, "value",
        |         CASE WHEN event_type = 'error' THEN 'delete'
        |              ELSE 'upsert' END AS op
        |  FROM ev WHERE event_type <> 'signup'),
        |last AS (
        |  SELECT user_id, op, event_type, "value" FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn FROM lg) WHERE rn = 1),
        |fin AS (
        |  SELECT coalesce(l.user_id, b.user_id) AS user_id,
        |         CASE WHEN l.user_id IS NULL THEN b.event_type
        |              ELSE l.event_type END AS event_type,
        |         CASE WHEN l.user_id IS NULL THEN b."value"
        |              ELSE l."value" END AS v
        |  FROM base b FULL JOIN last l ON b.user_id = l.user_id
        |  WHERE l.user_id IS NULL OR l.op <> 'delete')
        |SELECT event_type, count(*) AS n_users,
        |       CAST(sum(CAST(floor(v * 1000000) AS BIGINT)) AS BIGINT)
        |         AS sum_value_u
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_attribution" ->
      """WITH x AS (
        |  SELECT user_id, event_id, event_type, ts, "value",
        |         max(CASE WHEN event_type = 'click' THEN ts END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS last_click,
        |         max(CASE WHEN event_type = 'view' THEN ts END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS last_view
        |  FROM events),
        |p AS (
        |  SELECT *, greatest(last_click, last_view) AS touch_ts,
        |         CASE WHEN last_view IS NOT NULL AND
        |                   (last_click IS NULL OR last_view >= last_click)
        |              THEN 'view' ELSE 'click' END AS channel
        |  FROM x WHERE event_type = 'purchase')
        |SELECT channel, count(*) AS n_purchases,
        |       CAST(sum(CAST(floor("value" * 1000000) AS BIGINT)) AS BIGINT)
        |         AS sum_value_u,
        |       count(DISTINCT user_id) AS n_users
        |FROM p
        |WHERE touch_ts IS NOT NULL AND ts <= touch_ts + INTERVAL 7 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_click_paths" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |         lead(event_type, 1) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS e2,
        |         lead(event_type, 2) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS e3
        |  FROM events)
        |SELECT event_type || '>' || e2 || '>' || e3 AS path,
        |       count(*) AS n_traversals,
        |       count(DISTINCT user_id) AS n_users
        |FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n_traversals DESC, path LIMIT 15""".stripMargin,
    "q_ab_test" ->
      """WITH u AS (
        |  SELECT user_id, user_id % 2 AS cohort,
        |         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |           AS clicked,
        |         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS purchased
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(purchased) AS BIGINT) AS x
        |      FROM u WHERE clicked = 1 GROUP BY 1),
        |w AS (SELECT
        |        CAST(sum(CASE WHEN cohort = 0 THEN n END) AS BIGINT) AS n1,
        |        CAST(sum(CASE WHEN cohort = 0 THEN x END) AS BIGINT) AS x1,
        |        CAST(sum(CASE WHEN cohort = 1 THEN n END) AS BIGINT) AS n2,
        |        CAST(sum(CASE WHEN cohort = 1 THEN x END) AS BIGINT) AS x2
        |      FROM c)
        |SELECT n1, x1, n2, x2,
        |       (1000000 * x1) // n1 AS conv1_ppm,
        |       (1000000 * x2) // n2 AS conv2_ppm,
        |       CASE WHEN x1 > 0
        |            THEN (1000000 * (x2 * n1 - x1 * n2)) // (x1 * n2) END
        |         AS lift_ppm,
        |       CASE WHEN x1 + x2 > 0 AND n1 + n2 - x1 - x2 > 0
        |            THEN CAST(floor(
        |              (CAST(n1 + n2 AS DOUBLE) *
        |               (CAST(x1 AS DOUBLE) * n2 - CAST(x2 AS DOUBLE) * n1) *
        |               (CAST(x1 AS DOUBLE) * n2 - CAST(x2 AS DOUBLE) * n1))
        |              * 1000.0 /
        |              (CAST(n1 AS DOUBLE) * n2 * (x1 + x2)
        |               * (n1 + n2 - x1 - x2))) AS BIGINT) END AS chi2_milli
        |FROM w""".stripMargin,
    "q_kmeans_exact" ->
      """WITH v AS (
        |  SELECT vec_id,
        |         unnest(generate_series(0, len(embedding) - 1)) AS pos,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
        |              AS BIGINT) AS xq
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, pos, xq AS c FROM v WHERE vec_id < 4),
        |d1 AS (SELECT va.vec_id, c.cid,
        |              CAST(sum((va.xq - c.c) * (va.xq - c.c)) AS BIGINT) AS d2
        |       FROM v va JOIN c0 c ON c.pos = va.pos GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cid FROM (
        |        SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |          ORDER BY d2, cid) AS rn FROM d1) WHERE rn = 1),
        |u1 AS (SELECT a.cid, va.pos,
        |              CAST(sum(va.xq) AS BIGINT) // count(*) AS c
        |       FROM v va JOIN a1 a USING (vec_id) GROUP BY 1, 2),
        |c1 AS (SELECT c0.cid, c0.pos, coalesce(u1.c, c0.c) AS c
        |       FROM c0 LEFT JOIN u1 ON u1.cid = c0.cid AND u1.pos = c0.pos),
        |d2s AS (SELECT va.vec_id, c.cid,
        |               CAST(sum((va.xq - c.c) * (va.xq - c.c)) AS BIGINT) AS d2
        |        FROM v va JOIN c1 c ON c.pos = va.pos GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cid FROM (
        |        SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |          ORDER BY d2, cid) AS rn FROM d2s) WHERE rn = 1),
        |u2 AS (SELECT a.cid, va.pos,
        |              CAST(sum(va.xq) AS BIGINT) // count(*) AS c
        |       FROM v va JOIN a2 a USING (vec_id) GROUP BY 1, 2),
        |c2 AS (SELECT c1.cid, c1.pos, coalesce(u2.c, c1.c) AS c
        |       FROM c1 LEFT JOIN u2 ON u2.cid = c1.cid AND u2.pos = c1.pos),
        |d3 AS (SELECT va.vec_id, c.cid,
        |              CAST(sum((va.xq - c.c) * (va.xq - c.c)) AS BIGINT) AS d2
        |       FROM v va JOIN c2 c ON c.pos = va.pos GROUP BY 1, 2),
        |fin AS (SELECT vec_id, cid, d2 FROM (
        |         SELECT vec_id, cid, d2, row_number() OVER (PARTITION BY vec_id
        |           ORDER BY d2, cid) AS rn FROM d3) WHERE rn = 1)
        |SELECT cid, count(*) AS n, CAST(sum(d2) AS BIGINT) AS inertia,
        |       min(vec_id) AS min_vec
        |FROM fin GROUP BY cid ORDER BY cid""".stripMargin,
    "q_silhouette" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |         unnest(generate_series(0, len(embedding) - 1)) AS pos,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
        |              AS BIGINT) AS xq
        |  FROM embeddings),
        |cents AS (
        |  SELECT label AS clabel, pos,
        |         CAST(sum(xq) AS BIGINT) // count(*) AS c
        |  FROM v GROUP BY 1, 2),
        |d2 AS (
        |  SELECT va.vec_id, va.label, ct.clabel,
        |         CAST(sum((va.xq - ct.c) * (va.xq - ct.c)) AS BIGINT) AS d2
        |  FROM v va JOIN cents ct ON ct.pos = va.pos
        |  GROUP BY 1, 2, 3),
        |ab AS (
        |  SELECT vec_id, label,
        |         max(CASE WHEN clabel = label THEN d2 END) AS a,
        |         min(CASE WHEN clabel <> label THEN d2 END) AS b
        |  FROM d2 GROUP BY 1, 2),
        |s AS (
        |  SELECT label,
        |         CASE WHEN greatest(a, b) > 0
        |              THEN (1000000 * (b - a)) // greatest(a, b)
        |              ELSE 0 END AS s_ppm
        |  FROM ab)
        |SELECT label, count(*) AS n,
        |       CAST(sum(s_ppm) AS BIGINT) // count(*) AS mean_s_ppm,
        |       CAST(sum(CASE WHEN s_ppm < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_neg
        |FROM s GROUP BY label ORDER BY label""".stripMargin,
    "q_skyline" ->
      """WITH d AS (
        |  SELECT lang, doc_id, n_chars,
        |         (1000000 * CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
        |                    AS BIGINT)) // n_chars AS density_ppm
        |  FROM documents),
        |pl AS (SELECT lang, n_chars, max(density_ppm) AS vmax
        |       FROM d GROUP BY 1, 2),
        |fr AS (
        |  SELECT lang, n_chars, vmax,
        |         max(vmax) OVER (PARTITION BY lang ORDER BY n_chars DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS prevmax
        |  FROM pl),
        |sky AS (
        |  SELECT d.lang, d.doc_id, d.n_chars, d.density_ppm
        |  FROM d JOIN fr ON fr.lang = d.lang AND fr.n_chars = d.n_chars
        |  WHERE (fr.prevmax IS NULL OR fr.vmax > fr.prevmax)
        |    AND d.density_ppm = fr.vmax)
        |SELECT lang, count(*) AS n_skyline, max(n_chars) AS max_len,
        |       max(density_ppm) AS max_density_ppm, min(doc_id) AS min_doc
        |FROM sky GROUP BY lang ORDER BY lang""".stripMargin,
    "q_ks_test" ->
      """WITH h AS (
        |  SELECT n_chars,
        |         CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS m1,
        |         CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS m2
        |  FROM documents WHERE source IN ('src0', 'src1')
        |  GROUP BY 1),
        |c AS (
        |  SELECT n_chars,
        |         CAST(sum(m1) OVER (ORDER BY n_chars) AS BIGINT) AS cum1,
        |         CAST(sum(m2) OVER (ORDER BY n_chars) AS BIGINT) AS cum2,
        |         CAST((SELECT sum(m1) FROM h) AS BIGINT) AS n1,
        |         CAST((SELECT sum(m2) FROM h) AS BIGINT) AS n2
        |  FROM h),
        |g AS (SELECT *, abs(cum1 * n2 - cum2 * n1) AS gap FROM c),
        |mx AS (SELECT max(gap) AS d_scaled FROM g)
        |SELECT max(g.n1) AS n1, max(g.n2) AS n2,
        |       max(mx.d_scaled) AS d_scaled,
        |       (1000000 * max(mx.d_scaled)) // (max(g.n1) * max(g.n2))
        |         AS d_ppm,
        |       min(CASE WHEN g.gap = mx.d_scaled THEN g.n_chars END)
        |         AS at_value
        |FROM g, mx""".stripMargin,
    "q_assortativity" ->
      """WITH raw AS (
        |  SELECT 'site-' || CAST(doc_id % 20 AS VARCHAR) AS src,
        |         'site-' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst
        |  FROM documents WHERE doc_id % 20 < 17
        |  UNION ALL
        |  SELECT 'site-' || CAST(doc_id % 20 AS VARCHAR),
        |         'site-' || CAST((doc_id * 3 + 5) % 20 AS VARCHAR)
        |  FROM documents WHERE doc_id % 20 < 17 AND (doc_id % 20) % 3 = 0),
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |  FROM raw WHERE src <> dst),
        |adj AS (SELECT u AS a, v AS b FROM und
        |        UNION ALL SELECT v, u FROM und),
        |deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY 1),
        |p AS (
        |  SELECT dx.d AS dx, dy.d AS dy
        |  FROM adj JOIN deg dx ON dx.a = adj.a
        |           JOIN deg dy ON dy.a = adj.b),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m2,
        |             CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
        |             CAST(sum(dx * dx) AS BIGINT) AS sxx,
        |             CAST(sum(dy * dy) AS BIGINT) AS syy,
        |             CAST(sum(dx * dy) AS BIGINT) AS sxy
        |      FROM p)
        |SELECT m2, m2 * sxy - sx * sy AS num,
        |       m2 * sxx - sx * sx AS d1, m2 * syy - sy * sy AS d2,
        |       CASE WHEN m2 * sxx - sx * sx > 0 AND m2 * syy - sy * sy > 0
        |            THEN CAST(floor(CAST(m2 * sxy - sx * sy AS DOUBLE) * 1000.0
        |                   / sqrt(CAST(m2 * sxx - sx * sx AS DOUBLE)
        |                          * (m2 * syy - sy * sy))) AS BIGINT) END
        |         AS r_milli
        |FROM m""".stripMargin,
    "q_hits" ->
      """WITH raw AS (
        |  SELECT 'site-' || CAST(doc_id % 20 AS VARCHAR) AS src,
        |         'site-' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst
        |  FROM documents WHERE doc_id % 20 < 17
        |  UNION ALL
        |  SELECT 'site-' || CAST(doc_id % 20 AS VARCHAR),
        |         'site-' || CAST((doc_id * 3 + 5) % 20 AS VARCHAR)
        |  FROM documents WHERE doc_id % 20 < 17 AND (doc_id % 20) % 3 = 0),
        |e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h FROM n),
        |a1r AS (
        |  SELECT n.node, CAST(coalesce(s.raw, 0) AS BIGINT) AS raw
        |  FROM n LEFT JOIN (SELECT e.dst AS node, sum(h0.h) AS raw
        |                    FROM e JOIN h0 ON h0.node = e.src GROUP BY 1) s
        |    ON s.node = n.node),
        |a1 AS (SELECT node, (1000000 * raw) // (SELECT max(raw) FROM a1r) AS a
        |       FROM a1r),
        |h1r AS (
        |  SELECT n.node, CAST(coalesce(s.raw, 0) AS BIGINT) AS raw
        |  FROM n LEFT JOIN (SELECT e.src AS node, sum(a1.a) AS raw
        |                    FROM e JOIN a1 ON a1.node = e.dst GROUP BY 1) s
        |    ON s.node = n.node),
        |h1 AS (SELECT node, (1000000 * raw) // (SELECT max(raw) FROM h1r) AS h
        |       FROM h1r),
        |a2r AS (
        |  SELECT n.node, CAST(coalesce(s.raw, 0) AS BIGINT) AS raw
        |  FROM n LEFT JOIN (SELECT e.dst AS node, sum(h1.h) AS raw
        |                    FROM e JOIN h1 ON h1.node = e.src GROUP BY 1) s
        |    ON s.node = n.node),
        |a2 AS (SELECT node, (1000000 * raw) // (SELECT max(raw) FROM a2r) AS a
        |       FROM a2r),
        |h2r AS (
        |  SELECT n.node, CAST(coalesce(s.raw, 0) AS BIGINT) AS raw
        |  FROM n LEFT JOIN (SELECT e.src AS node, sum(a2.a) AS raw
        |                    FROM e JOIN a2 ON a2.node = e.dst GROUP BY 1) s
        |    ON s.node = n.node),
        |h2 AS (SELECT node, (1000000 * raw) // (SELECT max(raw) FROM h2r) AS h
        |       FROM h2r)
        |SELECT a2.node, a2.a AS auth_u, h2.h AS hub_u
        |FROM a2 JOIN h2 USING (node) ORDER BY node""".stripMargin,
    "q_corr_matrix" ->
      """WITH l AS (
        |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
        |         CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y,
        |         CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS z
        |  FROM lineitem),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |             CAST(sum(z) AS BIGINT) AS sz,
        |             CAST(sum(x * x) AS BIGINT) AS sxx,
        |             CAST(sum(y * y) AS BIGINT) AS syy,
        |             CAST(sum(z * z) AS BIGINT) AS szz,
        |             CAST(sum(x * y) AS BIGINT) AS sxy,
        |             CAST(sum(x * z) AS BIGINT) AS sxz,
        |             CAST(sum(y * z) AS BIGINT) AS syz
        |      FROM l)
        |SELECT n,
        |       CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |         * 1000.0 / sqrt((CAST(n AS DOUBLE) * sxx
        |                          - CAST(sx AS DOUBLE) * sx)
        |                       * (CAST(n AS DOUBLE) * syy
        |                          - CAST(sy AS DOUBLE) * sy))) AS BIGINT)
        |         AS r_qty_price_milli,
        |       CAST(floor((CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
        |         * 1000.0 / sqrt((CAST(n AS DOUBLE) * sxx
        |                          - CAST(sx AS DOUBLE) * sx)
        |                       * (CAST(n AS DOUBLE) * szz
        |                          - CAST(sz AS DOUBLE) * sz))) AS BIGINT)
        |         AS r_qty_disc_milli,
        |       CAST(floor((CAST(n AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz)
        |         * 1000.0 / sqrt((CAST(n AS DOUBLE) * syy
        |                          - CAST(sy AS DOUBLE) * sy)
        |                       * (CAST(n AS DOUBLE) * szz
        |                          - CAST(sz AS DOUBLE) * sz))) AS BIGINT)
        |         AS r_price_disc_milli
        |FROM m""".stripMargin,
    "q_freshness" ->
      """WITH g AS (SELECT max(epoch_us(ts)) AS gm FROM events),
        |h AS (
        |  SELECT event_type, (g.gm - epoch_us(ts)) // 60000000 AS lag_min,
        |         CAST(count(*) AS BIGINT) AS m
        |  FROM events, g GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, lag_min,
        |         CAST(sum(m) OVER (PARTITION BY event_type
        |           ORDER BY lag_min) AS BIGINT) AS cum,
        |         CAST(sum(m) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM h)
        |SELECT event_type, max(n) AS n,
        |       min(CASE WHEN cum >= CAST(ceil(0.5 * n) AS BIGINT)
        |           THEN lag_min END) AS p50_lag_min,
        |       min(CASE WHEN cum >= CAST(ceil(0.95 * n) AS BIGINT)
        |           THEN lag_min END) AS p95_lag_min,
        |       max(lag_min) AS max_lag_min
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_seq_patterns" ->
      """WITH per AS (
        |  SELECT user_id, event_type,
        |         min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
        |  FROM events GROUP BY 1, 2),
        |n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM per),
        |p AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb,
        |         CAST(count(*) AS BIGINT) AS n_users
        |  FROM per a JOIN per b ON b.user_id = a.user_id
        |  WHERE a.event_type <> b.event_type AND a.first_us < b.last_us
        |  GROUP BY 1, 2)
        |SELECT ta, tb, n_users, (1000000 * n_users) // n.nu AS supp_ppm
        |FROM p, n
        |ORDER BY n_users DESC, ta, tb LIMIT 15""".stripMargin,
    "q_entropy_rate" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |tr AS (SELECT event_type AS cur, nxt, CAST(count(*) AS BIGINT) AS c
        |       FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT cur, CAST(sum(c) AS BIGINT) AS r FROM tr GROUP BY 1),
        |cells AS (
        |  SELECT tr.cur,
        |         tr.c * (CAST(floor(ln(r.r) * 1000000 + 0.5) AS BIGINT)
        |               - CAST(floor(ln(tr.c) * 1000000 + 0.5) AS BIGINT))
        |           AS contrib,
        |         r.r
        |  FROM tr JOIN r ON r.cur = tr.cur)
        |SELECT cur, max(r) AS n_transitions, count(*) AS n_next_types,
        |       CAST(sum(contrib) AS BIGINT) // max(r) AS h_cond_micro
        |FROM cells GROUP BY cur ORDER BY cur""".stripMargin,
    "q_theil_sen" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         epoch_us(date_trunc('day', ts)) // 86400000000 AS di,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |sl AS (
        |  SELECT a.event_type,
        |         (1000000 * (b.y - a.y)) // (b.di - a.di) AS s_u
        |  FROM daily a JOIN daily b
        |    ON b.event_type = a.event_type AND a.di < b.di),
        |h AS (SELECT event_type, s_u, CAST(count(*) AS BIGINT) AS m
        |      FROM sl GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, s_u,
        |         CAST(sum(m) OVER (PARTITION BY event_type ORDER BY s_u)
        |              AS BIGINT) AS cum,
        |         CAST(sum(m) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM h)
        |SELECT event_type, max(n) AS n_pairs,
        |       min(CASE WHEN cum >= (n + 1) // 2 THEN s_u END)
        |         AS median_slope_u
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_dbscan" ->
      """WITH RECURSIVE q AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))
        |           AS q
        |  FROM embeddings WHERE vec_id < 1000),
        |und AS (
        |  SELECT a.vec_id AS ida, b.vec_id AS idb
        |  FROM q a JOIN q b ON a.vec_id < b.vec_id
        |  WHERE list_sum(list_transform(list_zip(a.q, b.q),
        |          t -> (t[1] - t[2]) * (t[1] - t[2]))) <= 1400000),
        |adj AS (SELECT ida AS node, idb AS nb FROM und
        |        UNION ALL SELECT idb, ida FROM und),
        |core AS (SELECT node FROM adj GROUP BY node HAVING count(*) >= 3),
        |ce AS (SELECT u.ida, u.idb FROM und u
        |       JOIN core c1 ON c1.node = u.ida
        |       JOIN core c2 ON c2.node = u.idb),
        |cedges AS (SELECT ida AS u, idb AS v FROM ce
        |           UNION SELECT idb, ida FROM ce),
        |reach(node, lab) AS (
        |  SELECT DISTINCT u, u FROM cedges
        |  UNION
        |  SELECT e.v, r.lab FROM reach r JOIN cedges e ON e.u = r.node
        |  WHERE r.lab < e.v),
        |comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY 1),
        |corelab AS (
        |  SELECT c.node, coalesce(cp.component, c.node) AS cluster
        |  FROM core c LEFT JOIN comp cp ON cp.node = c.node),
        |borderlab AS (
        |  SELECT a.node, min(cl.cluster) AS cluster
        |  FROM adj a JOIN corelab cl ON cl.node = a.nb
        |  WHERE a.node NOT IN (SELECT node FROM core)
        |  GROUP BY 1),
        |cl AS (
        |  SELECT c.cluster, count(*) AS n_core,
        |         coalesce(b.n_border, 0) AS n_border
        |  FROM corelab c LEFT JOIN (
        |    SELECT cluster, CAST(count(*) AS BIGINT) AS n_border
        |    FROM borderlab GROUP BY 1) b USING (cluster)
        |  GROUP BY 1, 3)
        |SELECT cluster, CAST(n_core AS BIGINT) AS n_core,
        |       CAST(n_border AS BIGINT) AS n_border,
        |       CAST(n_core + n_border AS BIGINT) AS n_pts
        |FROM cl
        |UNION ALL
        |SELECT -1, 0, 0,
        |       (SELECT count(*) FROM q)
        |       - (SELECT count(*) FROM corelab)
        |       - (SELECT count(*) FROM borderlab)
        |ORDER BY cluster""".stripMargin,
    "q_pareto" ->
      """WITH h AS (SELECT lang, n_chars, count(*) AS m
        |           FROM documents GROUP BY 1, 2),
        |c AS (SELECT lang, n_chars, m,
        |        CAST(sum(m * n_chars) OVER (PARTITION BY lang
        |          ORDER BY n_chars DESC) AS BIGINT) AS cumc,
        |        CAST(sum(m) OVER (PARTITION BY lang
        |          ORDER BY n_chars DESC) AS BIGINT) AS cumn,
        |        CAST(sum(m * n_chars) OVER (PARTITION BY lang) AS BIGINT) AS s,
        |        CAST(sum(m) OVER (PARTITION BY lang) AS BIGINT) AS n
        |      FROM h),
        |x AS (SELECT *, cumc - m * n_chars AS above FROM c),
        |y AS (SELECT *,
        |        (4 * s - 5 * above + 5 * n_chars - 1) // (5 * n_chars) AS j
        |      FROM x WHERE above * 5 < s * 4 AND cumc * 5 >= s * 4)
        |SELECT lang, n, s, cumn - m + j AS k80,
        |       (1000000 * (cumn - m + j)) // n AS k80_ppm,
        |       (1000000 * (above + j * n_chars)) // s AS share_ppm
        |FROM y ORDER BY 1""".stripMargin,
    "q_mutual_info" ->
      """WITH o AS (
        |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
        |         CAST(count(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
        |c AS (SELECT hod, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS t FROM o),
        |cells AS (
        |  SELECT o.event_type, o.o,
        |         o.o * (CAST(floor(ln(o.o * t.t) * 1000000 + 0.5) AS BIGINT) -
        |                CAST(floor(ln(r.r * c.c) * 1000000 + 0.5) AS BIGINT))
        |           AS cell_mi
        |  FROM o JOIN r USING (event_type) JOIN c USING (hod) CROSS JOIN t)
        |SELECT event_type, count(*) AS n_cells,
        |       CAST(sum(o) AS BIGINT) AS n_events,
        |       CAST(sum(cell_mi) AS BIGINT) AS mi_contrib_micro
        |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_benford" ->
      """WITH exp(digit, exp_ppm) AS (VALUES
        |  (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
        |  (6, 66947), (7, 57992), (8, 51153), (9, 45757)),
        |o AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |           AS VARCHAR), 1, 1) AS INTEGER) AS digit,
        |         CAST(count(*) AS BIGINT) AS o
        |  FROM orders GROUP BY 1),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o)
        |SELECT CAST(o.digit AS BIGINT) AS digit, o.o,
        |       (1000000 * o.o) // n.n AS obs_ppm,
        |       CAST(exp.exp_ppm AS BIGINT) AS exp_ppm,
        |       (1000000 * o.o) // n.n - exp.exp_ppm AS dev_ppm
        |FROM o JOIN exp USING (digit) CROSS JOIN n
        |ORDER BY 1""".stripMargin,
    "q_funnel3" ->
      """WITH c AS (
        |  SELECT user_id, min(ts) AS c0 FROM events
        |  WHERE event_type = 'click' GROUP BY 1),
        |v AS (
        |  SELECT e.user_id, min(e.ts) AS v0, min(c.c0) AS c0
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'view' AND e.ts > c.c0 GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS p0
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > v.v0
        |    AND e.ts <= v.c0 + INTERVAL 7 DAY
        |  GROUP BY 1)
        |SELECT CAST(CAST(c.c0 AS DATE) AS VARCHAR) AS cohort_day,
        |       count(*) AS n_clicked,
        |       CAST(sum(CASE WHEN v.v0 IS NOT NULL THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_viewed,
        |       CAST(sum(CASE WHEN p.p0 IS NOT NULL THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_converted
        |FROM c LEFT JOIN v ON c.user_id = v.user_id
        |       LEFT JOIN p ON c.user_id = p.user_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_quantile_norm" ->
      """WITH d AS (SELECT source, doc_id, n_chars FROM documents),
        |r AS (SELECT source, doc_id, n_chars,
        |             CAST(row_number() OVER (PARTITION BY source
        |               ORDER BY n_chars, doc_id) AS BIGINT) AS r,
        |             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS ns
        |      FROM d),
        |g AS (SELECT CAST(row_number() OVER (ORDER BY n_chars, doc_id)
        |               AS BIGINT) AS j,
        |             n_chars AS gval
        |      FROM d),
        |ng AS (SELECT CAST(count(*) AS BIGINT) AS ng FROM d),
        |m AS (SELECT r.source, r.n_chars, g.gval
        |      FROM r CROSS JOIN ng
        |      JOIN g ON g.j = (r.r * ng.ng + r.ns - 1) // r.ns)
        |SELECT source, count(*) AS n,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_raw,
        |       CAST(sum(gval) AS BIGINT) AS sum_norm,
        |       min(gval) AS min_norm, max(gval) AS max_norm
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pattern_negation" ->
      """WITH x AS (
        |  SELECT user_id, event_id, event_type, ts,
        |         max(CASE WHEN event_type = 'click' THEN ts END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS last_click,
        |         max(CASE WHEN event_type = 'error' THEN ts END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS last_error
        |  FROM events)
        |SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |       count(*) AS n_matched,
        |       CAST(sum(CASE WHEN last_error IS NULL OR last_error <= last_click
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
        |       CAST(sum(CASE WHEN last_error IS NULL OR last_error <= last_click
        |                THEN (epoch_us(ts) - epoch_us(last_click)) // 60000000
        |                ELSE 0 END) AS BIGINT) AS sum_gap_min
        |FROM x
        |WHERE event_type = 'purchase' AND last_click IS NOT NULL
        |  AND ts <= last_click + INTERVAL 7 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_peak_concurrency" ->
      """WITH iv AS (
        |  SELECT event_type, epoch_us(ts) AS s,
        |         epoch_us(ts) + CAST(json_extract_string(props, '$.k') AS BIGINT)
        |           * 1000000 AS e
        |  FROM events
        |  WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 0),
        |marks AS (
        |  SELECT event_type, s AS t, CAST(1 AS BIGINT) AS d FROM iv
        |  UNION ALL
        |  SELECT event_type, e AS t, CAST(-1 AS BIGINT) AS d FROM iv),
        |sw AS (
        |  SELECT event_type, t,
        |         CAST(sum(d) OVER (PARTITION BY event_type ORDER BY t, d)
        |           AS BIGINT) AS cur
        |  FROM marks),
        |pk AS (SELECT event_type, max(cur) AS peak FROM sw GROUP BY 1)
        |SELECT sw.event_type, max(pk.peak) AS peak, min(sw.t) AS peak_at_us
        |FROM sw JOIN pk ON sw.event_type = pk.event_type AND sw.cur = pk.peak
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_boolean_retrieval" ->
      s"""WITH q(qid, qtext) AS (VALUES (1, 'sort merge join'),
         |  (2, 'hash table scan'), (3, 'stream window batch')),
         |qt AS (SELECT DISTINCT qid, unnest(string_split(qtext, ' ')) AS t FROM q),
         |nq AS (SELECT qid, count(*) AS nt FROM qt GROUP BY 1),
         |dt AS (SELECT DISTINCT doc_id, unnest($ToksSql) AS t FROM documents),
         |m AS (SELECT qt.qid, dt.doc_id, count(*) AS mt
         |      FROM dt JOIN qt USING (t) GROUP BY 1, 2)
         |SELECT CAST(m.qid AS BIGINT) AS qid, count(*) AS n_docs,
         |       CAST(sum(m.doc_id) AS BIGINT) AS sum_doc_ids,
         |       min(m.doc_id) AS min_doc, max(m.doc_id) AS max_doc
         |FROM m JOIN nq ON m.qid = nq.qid AND m.mt = nq.nt
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_phrase_search" ->
      s"""WITH p(pid, w1, w2) AS (VALUES (1, 'sort', 'merge'),
         |  (2, 'hash', 'table'), (3, 'window', 'batch')),
         |tk AS (SELECT doc_id, $ToksSql AS toks FROM documents),
         |ix AS (SELECT doc_id, toks, unnest(range(1, list_count(toks))) AS i
         |       FROM tk),
         |m AS (SELECT DISTINCT p.pid, ix.doc_id
         |      FROM ix JOIN p ON ix.toks[i] = p.w1 AND ix.toks[i+1] = p.w2)
         |SELECT CAST(pid AS BIGINT) AS pid, count(*) AS n_docs,
         |       CAST(sum(doc_id) AS BIGINT) AS sum_doc_ids
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_value_histogram" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |b AS (SELECT event_type, length(bin(cents)) - 1 AS bkt FROM ev),
        |h AS (SELECT event_type, bkt, count(*) AS n FROM b GROUP BY 1, 2),
        |c AS (SELECT event_type, bkt, n,
        |             sum(n) OVER (PARTITION BY event_type ORDER BY bkt) AS cumn,
        |             sum(n) OVER (PARTITION BY event_type) AS tot
        |      FROM h),
        |p AS (SELECT event_type, CAST(min(bkt) AS BIGINT) AS p50_bucket
        |      FROM c WHERE cumn * 2 >= tot GROUP BY 1),
        |m AS (SELECT event_type, count(*) AS n,
        |             CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT) AS med2
        |      FROM ev GROUP BY 1)
        |SELECT m.event_type, m.n, p.p50_bucket, m.med2,
        |       (m.med2 >= (CAST(1 AS BIGINT) << (p.p50_bucket + 1)) AND
        |        m.med2 <  (CAST(1 AS BIGINT) << (p.p50_bucket + 2))) AS median_in_bucket
        |FROM m JOIN p ON m.event_type = p.event_type
        |ORDER BY m.event_type""".stripMargin,
    "q_lsh_bucket_audit" ->
      """SELECT band, (SELECT count(*) FROM documents) AS sum_size, true AS cap_ok
        |FROM (SELECT unnest(generate_series(0, 15)) AS band)
        |ORDER BY band""".stripMargin,
    "q_setops" ->
      """SELECT
        |  (SELECT count(*) FROM (
        |     SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        |     INTERSECT
        |     SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')) AS n_both,
        |  (SELECT count(*) FROM (
        |     SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        |     EXCEPT
        |     SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')) AS n_only_early,
        |  (SELECT count(DISTINCT o_custkey) FROM orders) AS n_any""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT o_orderkey, upper(o_orderpriority) AS pr, year(o_orderdate) AS y,
        |       month(o_orderdate) AS m, length(o_orderstatus) AS ls,
        |       floor(sqrt(o_totalprice) * 10000 + 0.5) / 10000 AS sq,
        |       concat(o_orderstatus, '-', o_orderpriority) AS cc
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin,
    "q_array_funcs" ->
      """WITH g AS (
        |  SELECT user_id,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS gap
        |  FROM events),
        |per AS (
        |  SELECT user_id, CAST(max(gap) AS BIGINT) AS maxg,
        |         CAST(sum(gap) AS BIGINT) AS sumg
        |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
        |SELECT maxg // 3600000000 AS gap_h, count(*) AS n_users,
        |       CAST(sum(sumg) AS BIGINT) AS sum_gap_us
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_regex_extract" ->
      """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 10 AS k_bucket,
        |       count(*) AS n, max(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin,
    "q_asof_join" ->
      """SELECT event_type, count(o_totalprice) AS n_with_order,
        |       floor(avg(o_totalprice) * 100 + 0.5) / 100 AS avg_price
        |FROM events ASOF LEFT JOIN (
        |  SELECT o_custkey, o_orderdate, max(o_totalprice) AS o_totalprice
        |  FROM orders GROUP BY 1, 2) orders
        |  ON events.user_id = orders.o_custkey AND events.ts >= orders.o_orderdate
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_asof_forward" ->
      """WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase')
        |SELECT count(*) AS n_clicks, count(pts) AS n_matched,
        |       floor(avg((epoch_us(pts) - epoch_us(ts)) / 1000000.0) * 100 + 0.5) / 100 AS avg_gap_s
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.pts""".stripMargin,
    "q_asof_tolerance" ->
      """WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id AS pu, ts AS pts, max(value) AS value
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |j AS (SELECT c.ts, p.pts, p.value
        |      FROM c ASOF LEFT JOIN p ON c.user_id = p.pu AND c.ts >= p.pts),
        |tl AS (SELECT ts,
        |         -- gap compared in MICROSECONDS: Spark sees these ns
        |         -- timestamps truncated to us, so an ns-precision interval
        |         -- compare could flip a within-1us-of-6h boundary match
        |         CASE WHEN epoch_us(ts) - epoch_us(pts) <= 21600000000
        |              THEN pts END AS pts,
        |         CASE WHEN epoch_us(ts) - epoch_us(pts) <= 21600000000
        |              THEN value END AS value
        |       FROM j)
        |SELECT count(*) AS n_clicks, count(pts) AS n_matched,
        |       floor(sum(value) * 100 + 0.5) / 100 AS sum_value,
        |       floor(avg((epoch_us(ts) - epoch_us(pts)) / 1000000.0) * 100 + 0.5)
        |         / 100 AS avg_gap_s
        |FROM tl""".stripMargin,
    "q_range_join" ->
      """SELECT strftime(date_trunc('hour', c.ts), '%Y-%m-%d %H') AS hour,
        |       count(*) AS n_matches, count(DISTINCT c.user_id) AS n_users
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_us(p.ts) >= epoch_us(c.ts)
        | AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000
        |GROUP BY 1 ORDER BY hour""".stripMargin,
    "q_overlap_join" ->
      """SELECT strftime(date_trunc('hour', c.ts), '%Y-%m-%d %H') AS hour,
        |       count(*) AS n_overlaps, count(DISTINCT c.user_id) AS n_users
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_us(c.ts) <= epoch_us(p.ts) + 1800000000
        | AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000
        |GROUP BY 1 ORDER BY hour""".stripMargin,
    "q_overlap_autobucket" ->
      """SELECT strftime(date_trunc('hour', c.ts), '%Y-%m-%d %H') AS hour,
        |       count(*) AS n_overlaps, count(DISTINCT c.user_id) AS n_users
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_us(c.ts) <= epoch_us(p.ts) + 1800000000
        | AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000
        |GROUP BY 1 ORDER BY hour""".stripMargin,
    "q_skew_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_runtime_bloom" ->
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |       count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_dpp" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(floor("value" * 1000000) AS BIGINT)) AS BIGINT)
        |         AS sum_value_u
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_meta_count" ->
      """SELECT count(*) AS n_rows,
        |       min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
        |       min(l_partkey) AS min_part, max(l_partkey) AS max_part
        |FROM lineitem""".stripMargin,
    "q_compaction" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_golden_record" ->
      """WITH s AS (
        |  SELECT doc_id, 3 AS prio, text, CAST(NULL AS VARCHAR) AS lang,
        |         CAST(NULL AS BIGINT) AS n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id, 2, CAST(NULL AS VARCHAR), lang, n_chars + 1 FROM documents
        |  UNION ALL
        |  SELECT doc_id, 1, 'archived: ' || text, lang, n_chars FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         arg_max(text, CASE WHEN text IS NOT NULL THEN prio END) AS text,
        |         arg_max(lang, CASE WHEN lang IS NOT NULL THEN prio END) AS lang,
        |         arg_max(n_chars, CASE WHEN n_chars IS NOT NULL THEN prio END) AS n_chars
        |  FROM s GROUP BY 1)
        |SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(sum(CASE WHEN text LIKE 'archived: %' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_from_archive
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_constraints" ->
      """WITH v AS (
        |  SELECT 'in_range(o_totalprice,0.0,300000.0)' AS c,
        |         (SELECT count(*) FROM orders
        |          WHERE o_totalprice IS NOT NULL
        |            AND (o_totalprice < 0 OR o_totalprice > 300000)) AS n
        |  UNION ALL
        |  SELECT 'not_null(o_custkey)',
        |         (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
        |  UNION ALL
        |  SELECT 'ref_integrity(o_custkey)',
        |         (SELECT count(*) FROM orders o
        |          WHERE o.o_custkey IS NOT NULL
        |            AND NOT EXISTS (SELECT 1 FROM customer c
        |                            WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL
        |  SELECT 'satisfies(order_date_sane)',
        |         (SELECT count(*) FROM orders
        |          WHERE NOT coalesce(o_orderdate < TIMESTAMP '2002-01-01', false))
        |  UNION ALL
        |  SELECT 'unique(o_orderkey)',
        |         (SELECT CAST(coalesce(sum(k - 1), 0) AS BIGINT) FROM (
        |            SELECT count(*) AS k FROM orders GROUP BY o_orderkey)
        |          WHERE k > 1))
        |SELECT c AS "constraint", CAST(n AS BIGINT) AS n_violations,
        |       n = 0 AS passed
        |FROM v ORDER BY c""".stripMargin,
    "q_scd2" ->
      """WITH v1 AS (
        |  SELECT o_custkey AS cust, count(*) AS n, CAST(count(*) >= 3 AS INT) AS h
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
        |v2 AS (
        |  SELECT o_custkey AS cust, count(*) AS n, CAST(count(*) >= 3 AS INT) AS h
        |  FROM orders GROUP BY 1),
        |m AS (
        |  SELECT v2.cust, v1.cust AS c1, v1.n AS n1, v1.h AS h1, v2.n AS n2, v2.h AS h2
        |  FROM v2 LEFT JOIN v1 ON v1.cust = v2.cust),
        |rows_out AS (
        |  SELECT '1998-01-01' AS valid_from, true AS is_current, cust, n1 AS n, h1 AS h
        |  FROM m WHERE c1 IS NOT NULL AND n1 = n2 AND h1 = h2
        |  UNION ALL
        |  SELECT '1998-01-01', false, cust, n1, h1
        |  FROM m WHERE c1 IS NOT NULL AND NOT (n1 = n2 AND h1 = h2)
        |  UNION ALL
        |  SELECT '2001-09-01', true, cust, n2, h2
        |  FROM m WHERE c1 IS NULL OR NOT (n1 = n2 AND h1 = h2))
        |SELECT valid_from, is_current, count(*) AS n_rows,
        |       CAST(sum(cust) AS BIGINT) AS sum_keys,
        |       CAST(sum(n) AS BIGINT) AS sum_orders,
        |       CAST(sum(h) AS BIGINT) AS n_heavy
        |FROM rows_out GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_zorder_scan" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |       floor(min(value) * 100 + 0.5) / 100 AS min_v,
        |       floor(max(value) * 100 + 0.5) / 100 AS max_v
        |FROM events WHERE user_id BETWEEN 10 AND 20
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_streaming_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
        |       count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q_streaming_sink" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
        |       count(*) AS n
        |FROM events
        |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
        |        <= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
        |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q_streaming_chunk" ->
      s"""WITH lines AS (
         |  SELECT printf('evt %d type %s by user %d', event_id, event_type, user_id) AS text
         |  FROM events),
         |tok AS (SELECT $ToksSql AS toks FROM lines),
         |nn AS (SELECT toks, len(toks) AS n FROM tok WHERE len(toks) > 0),
         |ch AS (
         |  SELECT gs.i AS chunk_idx, toks[(gs.i*3+1):least(gs.i*3+4, n)] AS ctoks
         |  FROM nn, LATERAL (SELECT unnest(generate_series(0,
         |       CASE WHEN n <= 4 THEN 0 ELSE (n - 4 + 3 - 1)//3 END)) AS i) gs)
         |SELECT CAST(chunk_idx AS BIGINT) AS chunk_idx, count(*) AS n_chunks,
         |       count(DISTINCT array_to_string(ctoks, ' ')) AS n_distinct
         |FROM ch GROUP BY chunk_idx ORDER BY chunk_idx""".stripMargin,
    "q_streaming_join" ->
      """SELECT strftime(date_trunc('hour', c.ts), '%Y-%m-%d %H') AS hour,
        |       count(*) AS n_matches, count(DISTINCT c.user_id) AS n_users
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_us(p.ts) >= epoch_us(c.ts)
        | AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000
        |GROUP BY 1 ORDER BY hour""".stripMargin,
    "q_sessionize_custom" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 1000 AS ms FROM events),
        |marked AS (
        |  SELECT user_id, ms,
        |         CASE WHEN lag(ms) OVER w IS NULL
        |                OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
        |sess AS (
        |  SELECT user_id, ms,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ms
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked),
        |agg AS (
        |  SELECT user_id, sid, max(ms) AS s_end, count(*) AS n_ev
        |  FROM sess GROUP BY user_id, sid),
        |emitted AS (
        |  SELECT a.user_id, a.n_ev FROM agg a
        |  WHERE a.sid < (SELECT max(b.sid) FROM agg b WHERE b.user_id = a.user_id)
        |     OR a.s_end + 1800000 <
        |        (SELECT max(ms) FROM ev) - 3600000)
        |SELECT user_id, count(*) AS n_sessions, CAST(sum(n_ev) AS BIGINT) AS n_events,
        |       CAST(max(n_ev) AS BIGINT) AS max_session_events
        |FROM emitted GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_timed_sessions" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 1000 AS ms FROM events),
        |marked AS (
        |  SELECT user_id, ms,
        |         CASE WHEN lag(ms) OVER w IS NULL
        |                OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
        |sess AS (
        |  SELECT user_id, ms,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ms
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked),
        |agg AS (
        |  SELECT user_id, sid, max(ms) AS s_end, count(*) AS n_ev
        |  FROM sess GROUP BY user_id, sid),
        |emitted AS (
        |  SELECT a.user_id, a.n_ev FROM agg a
        |  WHERE a.sid < (SELECT max(b.sid) FROM agg b WHERE b.user_id = a.user_id)
        |     OR a.s_end + 1800000 <
        |        (SELECT max(ms) FROM ev) - 3600000)
        |SELECT user_id, count(*) AS n_sessions, CAST(sum(n_ev) AS BIGINT) AS n_events,
        |       CAST(max(n_ev) AS BIGINT) AS max_session_events
        |FROM emitted GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_streaming_hll" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
        |       count(DISTINCT user_id) AS n_users, true AS within_envelope
        |FROM events
        |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
        |        <= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
        |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q_streaming_heavy_hitters" ->
      """SELECT user_id, count(*) AS n,
        |       true AS fold_exact, true AS cms_ok
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, user_id LIMIT 10""".stripMargin,
    "q_streaming_left_join" ->
      """WITH c AS (SELECT user_id AS cu, ts AS cts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id AS pu, ts AS pts FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT c.cu, c.cts, p.pts
        |      FROM c LEFT JOIN p ON c.cu = p.pu
        |        AND epoch_us(p.pts) >= epoch_us(c.cts)
        |        AND epoch_us(p.pts) <= epoch_us(c.cts) + 3600000000),
        |wm AS (
        |  SELECT least((SELECT max(epoch_us(ts)) // 1000 FROM events WHERE event_type = 'click'),
        |               (SELECT max(epoch_us(ts)) // 1000 FROM events WHERE event_type = 'purchase'))
        |         - 3600000 AS w),
        |e AS (SELECT cu, cts, pts FROM j WHERE pts IS NOT NULL
        |      UNION ALL
        |      SELECT cu, cts, pts FROM j
        |      WHERE pts IS NULL
        |        AND epoch_us(cts) // 1000 + 3600000 < (SELECT w FROM wm))
        |SELECT strftime(date_trunc('hour', cts), '%Y-%m-%d %H') AS hour,
        |       CAST(sum(CASE WHEN pts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |       CAST(sum(CASE WHEN pts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |       count(DISTINCT cu) AS n_users
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    // the stream injects duplicates; a correct streaming dedup emits
    // exactly the distinct event set, so both columns are the distinct count
    "q_streaming_dedup" ->
      """SELECT event_type, count(DISTINCT event_id) AS n,
        |       count(DISTINCT event_id) AS n_ids
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_stream_static_join" ->
      """WITH dim AS (
        |  SELECT o_custkey AS user_id, count(*) AS n_orders FROM orders GROUP BY 1)
        |SELECT e.event_type, count(*) AS n_enriched,
        |       CAST(sum(d.n_orders) AS BIGINT) AS sum_orders
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q_sliding_window" ->
      """SELECT strftime(ws, '%Y-%m-%d %H:%M') AS ws, event_type, count(*) AS n
        |FROM (
        |  SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
        |                 time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS ws,
        |         event_type
        |  FROM events)
        |GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    "q_dedup_exact" ->
      s"""SELECT lang, count(*) AS n_docs, count(DISTINCT $FpSql) AS n_distinct
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_venn3" ->
      s"""WITH fp AS (
         |  SELECT DISTINCT source, $FpSql AS fp FROM documents
         |  WHERE source IN ('src0', 'src1', 'src2')),
         |mask AS (
         |  SELECT fp,
         |    CAST(max(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |    CAST(max(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS b,
         |    CAST(max(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS BIGINT) AS c
         |  FROM fp GROUP BY 1)
         |SELECT a * 4 + b * 2 + c AS region, count(*) AS n_contents
         |FROM mask GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_dedup_groups" ->
      s"""SELECT count(*) AS n_dup_groups, CAST(coalesce(sum(sz), 0) AS BIGINT) AS n_dup_docs FROM (
         |  SELECT $FpSql AS fp, count(*) AS sz FROM documents GROUP BY 1 HAVING count(*) > 1)""".stripMargin,
    "q_ngram_jaccard" ->
      s"""WITH toks AS (
         |  SELECT DISTINCT lang, doc_id, unnest($ToksSql) AS tok
         |  FROM documents WHERE doc_id < 500),
         |counts AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
         |  FROM toks a JOIN toks b
         |    ON a.lang = b.lang AND a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT i * 1.0 / (ca.n + cb.n - i) AS jac
         |  FROM inter JOIN counts ca ON ida = ca.doc_id JOIN counts cb ON idb = cb.doc_id)
         |SELECT count(*) AS n_pairs, floor(avg(jac) * 1000 + 0.5) / 1000 AS avg_jaccard
         |FROM j WHERE jac >= 0.8""".stripMargin,
    "q_containment" ->
      s"""WITH b0 AS (SELECT doc_id, $ToksSql AS t FROM documents),
         |tr AS (SELECT doc_id + 1000000 AS doc_id,
         |              t[1:CAST((len(t) * 6 + 9) // 10 AS BIGINT)] AS t
         |       FROM b0 WHERE doc_id % 9 = 0),
         |tk AS (SELECT * FROM b0 UNION ALL SELECT * FROM tr),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
         |         ELSE list_transform(range(len(t)-2),
         |                i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) END)) AS s
         |  FROM tk),
         |counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |m AS (
         |  SELECT ida, idb, i * 1.0 / (ca.n + cb.n - i) AS jac,
         |         i * 1.0 / least(ca.n, cb.n) AS cont
         |  FROM inter JOIN counts ca ON ida = ca.doc_id
         |       JOIN counts cb ON idb = cb.doc_id)
         |SELECT count(*) AS n_pairs,
         |       floor(avg(cont) * 1000 + 0.5) / 1000 AS avg_containment,
         |       CAST(coalesce(sum(CASE WHEN jac < 0.8 THEN 1 ELSE 0 END), 0)
         |         AS BIGINT) AS n_jaccard_misses
         |FROM m WHERE cont >= 0.95""".stripMargin,
    "q_multi_format" ->
      """SELECT event_type, count(*) AS n,
        |       floor(sum(value + value + value) * 100 + 0.5) / 100 AS sum3
        |FROM events WHERE event_id < 1000
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_schema_merge" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CASE WHEN event_id < 500 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_pre_schema,
        |       CAST(sum(CASE WHEN event_id >= 500
        |                     THEN CAST(floor("value" * 1000000) AS BIGINT) END)
        |         AS BIGINT) AS sum_value_u
        |FROM events WHERE event_id < 1000
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_oov_rate" ->
      s"""WITH tk AS (SELECT doc_id, lang, $ToksSql AS t FROM documents),
         |tok AS (SELECT lang, unnest(t) AS tok FROM tk),
         |tf AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
         |       FROM tok GROUP BY 1, 2),
         |v AS (SELECT tok FROM (
         |        SELECT tok, CAST(sum(cnt) AS BIGINT) AS total
         |        FROM tf GROUP BY 1) WHERE total >= 50),
         |agg AS (
         |  SELECT tf.lang, CAST(sum(tf.cnt) AS BIGINT) AS n_tokens,
         |         CAST(sum(CASE WHEN v.tok IS NULL THEN tf.cnt ELSE 0 END)
         |           AS BIGINT) AS n_oov
         |  FROM tf LEFT JOIN v ON tf.tok = v.tok GROUP BY 1)
         |SELECT lang, n_tokens, n_oov,
         |       CAST(n_oov * 1000000 // n_tokens AS BIGINT) AS oov_ppm
         |FROM agg ORDER BY lang""".stripMargin,
    "q_kl_sources" ->
      s"""WITH tk AS (SELECT source, $ToksSql AS t FROM documents
         |            WHERE source IN ('src0', 'src1')),
         |tok AS (SELECT source, unnest(t) AS tok FROM tk),
         |bt AS (SELECT tok,
         |         CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |         CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |       FROM tok GROUP BY 1),
         |tt AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
         |              CAST(count(*) AS BIGINT) AS v FROM bt),
         |terms AS (
         |  SELECT tt.na, tt.nb, tt.v,
         |    (ca + 1) * (CAST(floor(ln((ca + 1) * (nb + v)) * 1e6 + 0.5) AS BIGINT)
         |              - CAST(floor(ln((cb + 1) * (na + v)) * 1e6 + 0.5) AS BIGINT)) AS t_ab,
         |    (cb + 1) * (CAST(floor(ln((cb + 1) * (na + v)) * 1e6 + 0.5) AS BIGINT)
         |              - CAST(floor(ln((ca + 1) * (nb + v)) * 1e6 + 0.5) AS BIGINT)) AS t_ba
         |  FROM bt CROSS JOIN tt)
         |SELECT na, nb, v, CAST(sum(t_ab) AS BIGINT) AS kl_ab_u,
         |       CAST(sum(t_ba) AS BIGINT) AS kl_ba_u
         |FROM terms GROUP BY 1, 2, 3""".stripMargin,
    "q_join_size_est" ->
      """WITH a AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS ca
        |           FROM lineitem GROUP BY 1),
        |b AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS cb
        |      FROM orders GROUP BY 1)
        |SELECT CAST(sum(ca * cb) AS BIGINT) AS est_rows,
        |       count(*) AS n_shared_keys,
        |       CAST(max(ca * cb) AS BIGINT) AS max_key_rows,
        |       CAST(sum(ca) AS BIGINT) AS a_rows_on_shared,
        |       CAST(sum(cb) AS BIGINT) AS b_rows_on_shared
        |FROM a JOIN b USING (k)""".stripMargin,
    // full-scan answer: certifies the partial-aggregate MERGE ≡ rescan
    "q_incremental_agg" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(floor("value" * 1000000) AS BIGINT)) AS BIGINT)
        |         AS sum_vu,
        |       min(CAST(floor("value" * 1000000) AS BIGINT)) AS min_vu,
        |       max(CAST(floor("value" * 1000000) AS BIGINT)) AS max_vu
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // DuckDB dayofweek is 0=Sunday; Spark's is 1=Sunday — aligned with +1
    "q_date_suite" ->
      """WITH dd AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT CAST(quarter(d) AS BIGINT) AS q, count(*) AS n,
        |       CAST(CAST(max(d + INTERVAL 3 MONTH) AS DATE) AS VARCHAR) AS max_plus3m,
        |       CAST(max(last_day(d)) AS VARCHAR) AS max_month_end,
        |       CAST(sum(dayofweek(d) + 1) AS BIGINT) AS sum_dow,
        |       CAST(CAST(min(date_trunc('quarter', d)) AS DATE) AS VARCHAR)
        |         AS min_q_start
        |FROM dd GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_setops_all" ->
      """WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderkey % 3 = 0),
        |b AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderkey % 2 = 0),
        |u AS (SELECT p, count(*) AS n_union_all FROM (
        |        SELECT p FROM a UNION ALL SELECT p FROM b) GROUP BY 1),
        |i AS (SELECT p, count(*) AS n_intersect_all FROM (
        |        SELECT p FROM a INTERSECT ALL SELECT p FROM b) GROUP BY 1),
        |e AS (SELECT p, count(*) AS n_except_all FROM (
        |        SELECT p FROM a EXCEPT ALL SELECT p FROM b) GROUP BY 1)
        |SELECT u.p, u.n_union_all,
        |       coalesce(i.n_intersect_all, 0) AS n_intersect_all,
        |       coalesce(e.n_except_all, 0) AS n_except_all
        |FROM u LEFT JOIN i ON u.p = i.p LEFT JOIN e ON u.p = e.p
        |ORDER BY 1""".stripMargin,
    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT CAST(hour(ts) AS BIGINT) AS hod,
        |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |         CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |  FROM events GROUP BY 1),
        |long AS (
        |  SELECT hod, event_type, n
        |  FROM wide UNPIVOT (n FOR event_type IN (click, error, purchase, signup, view)))
        |SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
        |       CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_hours,
        |       max(n) AS max_hourly
        |FROM long GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_json_struct" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
        |       CAST(sum(CASE WHEN json_extract(props, '$.k') IS NULL THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_null_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_null_suite" ->
      """WITH s AS (
        |  SELECT o_orderpriority,
        |         CASE WHEN o_orderkey % 7 <> 0 THEN o_orderstatus END AS st
        |  FROM orders)
        |SELECT o_orderpriority, count(*) AS n,
        |       count(st) AS n_status,
        |       CAST(sum(CASE WHEN st IS NOT DISTINCT FROM 'F' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_f_nullsafe,
        |       CAST(sum(CASE WHEN st IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_null_nullsafe,
        |       CAST(sum(CASE WHEN nullif(st, 'O') IS NULL THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_nullif_o,
        |       CAST(sum(coalesce(CAST(length(st) AS BIGINT), -1)) AS BIGINT)
        |         AS sum_coalesced
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_decimal" ->
      """SELECT o_orderstatus, count(*) AS n,
        |       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
        |         AS VARCHAR) AS sum_price,
        |       CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS max_price,
        |       CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS min_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_suite" ->
      """WITH w AS (
        |  SELECT o_orderpriority,
        |         CAST(ntile(4) OVER ord AS BIGINT) AS q4,
        |         percent_rank() OVER ord AS pr,
        |         cume_dist() OVER ord AS cd
        |  FROM orders
        |  WINDOW ord AS (PARTITION BY o_orderpriority
        |                 ORDER BY o_totalprice, o_orderkey))
        |SELECT o_orderpriority, q4, count(*) AS n,
        |       floor(min(pr) * 1000000 + 0.5) / 1000000 AS min_pr,
        |       floor(max(pr) * 1000000 + 0.5) / 1000000 AS max_pr,
        |       floor(max(cd) * 1000000 + 0.5) / 1000000 AS max_cd
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_string_suite" ->
      """WITH s AS (
        |  SELECT CAST(levenshtein(c_name, reverse(c_name)) AS BIGINT) AS lev,
        |         CAST(length(replace(c_name, '0', '')) AS BIGINT) AS len_no_zero,
        |         lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded
        |  FROM customer)
        |SELECT lev % 4 AS lev_bucket, count(*) AS n,
        |       CAST(sum(len_no_zero) AS BIGINT) AS sum_len,
        |       max(padded) AS max_padded
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cond_agg" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
        |       bool_or(o_orderstatus = 'F') AS any_f,
        |       bool_and(o_totalprice > 0) AS all_positive,
        |       max(CASE WHEN o_orderstatus = 'O' THEN o_orderkey END) AS max_open_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpch_q3" ->
      """SELECT o_orderkey,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |         AS BIGINT) AS revenue_c,
        |       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue_c DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_base_c,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |         AS BIGINT) AS sum_disc_c,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
        |           AS BIGINT)) AS BIGINT) AS sum_charge_c,
        |       count(*) AS n,
        |       CAST(CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         // count(*) AS BIGINT) AS avg_price_c,
        |       CAST(CAST(sum(CAST(floor(l_discount * 10000) AS BIGINT)) AS BIGINT)
        |         // count(*) AS BIGINT) AS avg_disc_bp
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_tpch_q14" ->
      """SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
        |               THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |               ELSE 0 END) AS BIGINT) AS promo_c,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |         AS BIGINT) AS total_c,
        |       CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
        |               THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |               ELSE 0 END) AS BIGINT) * 1000000
        |         // CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |              AS BIGINT) AS BIGINT) AS promo_ppm
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,
    "q_tpch_q2" ->
      """WITH offer AS (
        |  SELECT l_partkey, l_suppkey,
        |         min(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS offer_c
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT p_partkey, s_name, n_name,
        |       CAST(floor(s_acctbal * 100) AS BIGINT) AS s_acctbal_c, o.offer_c
        |FROM part, offer o, supplier, nation, region
        |WHERE p_partkey = o.l_partkey AND s_suppkey = o.l_suppkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE' AND p_size = 15
        |  AND o.offer_c = (
        |    SELECT min(o2.offer_c) FROM offer o2, supplier s2, nation n2, region r2
        |    WHERE o2.l_partkey = p_partkey AND s2.s_suppkey = o2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
        |      AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey
        |LIMIT 20""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND epoch_us(l_shipdate) - epoch_us(o_orderdate)
        |                    > 2592000000000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpch_q7" ->
      """SELECT supp_nation, cust_nation, yr,
        |       CAST(sum(vol_c) AS BIGINT) AS revenue_c
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |             CAST(year(l_shipdate) AS BIGINT) AS yr,
        |             CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |               AS vol_c
        |      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |      JOIN orders ON o_orderkey = l_orderkey
        |      JOIN customer ON c_custkey = o_custkey
        |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |          OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        |        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00') shipping
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_tpch_q8" ->
      """WITH all_nations AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |         CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |           AS vol_c,
        |         n2.n_name AS supp_nation
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
        |SELECT yr,
        |       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol_c ELSE 0 END)
        |         AS BIGINT) AS nation_c,
        |       CAST(sum(vol_c) AS BIGINT) AS total_c,
        |       CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol_c ELSE 0 END)
        |         AS BIGINT) * 1000000 // CAST(sum(vol_c) AS BIGINT) AS BIGINT)
        |         AS share_ppm
        |FROM all_nations GROUP BY yr ORDER BY yr""".stripMargin,
    "q_tpch_q9" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |         AS BIGINT) AS profit_c
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_tpch_q11" ->
      """WITH val AS (
        |  SELECT l_partkey AS partkey,
        |         sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS value_c
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY 1)
        |SELECT partkey, CAST(value_c AS BIGINT) AS value_c
        |FROM val
        |WHERE value_c * (SELECT count(*) FROM val)
        |      > 3 * (SELECT sum(value_c) FROM val) // 2
        |ORDER BY value_c DESC, partkey""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_linestatus AS ship_class,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE epoch_us(l_shipdate) - epoch_us(o_orderdate) > 5184000000000
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpch_q13" ->
      """WITH c_orders AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |SELECT CAST(c_count AS BIGINT) AS c_count, count(*) AS custdist
        |FROM c_orders GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |           AS total_rev_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(total_rev_c AS BIGINT) AS total_rev_c
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_rev_c = (SELECT max(total_rev_c) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q16" ->
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 30""".stripMargin,
    "q_tpch_q17" ->
      """WITH pq AS (
        |  SELECT l_partkey AS pk, sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
        |         count(*) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT count(*) AS n_small,
        |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue_c
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |JOIN pq ON pk = l_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND CAST(l_quantity AS BIGINT) * 5 * cnt < sum_qty""".stripMargin,
    "q_tpch_q19" ->
      """SELECT count(*) AS n_lines,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |         AS BIGINT) AS revenue_c
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q_tpch_q20" ->
      """SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AFRICA'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        |    WHERE p_name LIKE 'small%'
        |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |    GROUP BY l_suppkey, l_partkey
        |    HAVING sum(CAST(l_quantity AS BIGINT)) > 40)
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND n_regionkey = (
        |        SELECT r_regionkey FROM region WHERE r_name = 'MIDDLE EAST')
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q_tpch_q22" ->
      """WITH pos AS (
        |  SELECT CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT CAST(c_custkey % 10 AS BIGINT) AS cntrycode, count(*) AS numcust,
        |       CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |         AS totacctbal_c
        |FROM customer
        |WHERE c_custkey % 10 IN (1, 3, 5, 7, 9)
        |  AND CAST(floor(c_acctbal * 100) AS BIGINT) * (SELECT count(*) FROM pos)
        |      > (SELECT sum(bal_c) FROM pos)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_recursive_cte" ->
      """WITH RECURSIVE anc AS (
        |  SELECT CAST(0 AS BIGINT) AS k, CAST(0 AS BIGINT) AS depth
        |  UNION ALL
        |  SELECT s_suppkey, depth + 1
        |  FROM supplier JOIN anc ON s_suppkey // 2 = anc.k
        |  WHERE s_suppkey > 0)
        |SELECT depth, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM anc GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_streaming_full_join" ->
      """WITH c AS (SELECT user_id AS cu, ts AS cts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id AS pu, ts AS pts FROM events WHERE event_type = 'purchase'),
        |m AS (SELECT c.cu, c.cts, p.pu, p.pts
        |      FROM c JOIN p ON c.cu = p.pu
        |        AND epoch_us(p.pts) >= epoch_us(c.cts)
        |        AND epoch_us(p.pts) <= epoch_us(c.cts) + 3600000000),
        |wm AS (
        |  SELECT least((SELECT max(epoch_us(ts)) // 1000 FROM events WHERE event_type = 'click'),
        |               (SELECT max(epoch_us(ts)) // 1000 FROM events WHERE event_type = 'purchase'))
        |         - 3600000 AS w),
        |co AS (SELECT cu, cts, CAST(NULL AS BIGINT) AS pu, CAST(NULL AS TIMESTAMP) AS pts
        |       FROM c WHERE NOT EXISTS (
        |           SELECT 1 FROM p WHERE p.pu = c.cu
        |             AND epoch_us(p.pts) >= epoch_us(c.cts)
        |             AND epoch_us(p.pts) <= epoch_us(c.cts) + 3600000000)
        |         AND epoch_us(cts) // 1000 + 3600000 < (SELECT w FROM wm)),
        |po AS (SELECT CAST(NULL AS BIGINT) AS cu, CAST(NULL AS TIMESTAMP) AS cts, pu, pts
        |       FROM p WHERE NOT EXISTS (
        |           SELECT 1 FROM c WHERE c.cu = p.pu
        |             AND epoch_us(p.pts) >= epoch_us(c.cts)
        |             AND epoch_us(p.pts) <= epoch_us(c.cts) + 3600000000)
        |         AND epoch_us(pts) // 1000 < (SELECT w FROM wm)),
        |e AS (SELECT * FROM m UNION ALL SELECT * FROM co UNION ALL SELECT * FROM po)
        |SELECT strftime(date_trunc('hour', coalesce(cts, pts)), '%Y-%m-%d %H') AS hour,
        |       CAST(sum(CASE WHEN cts IS NOT NULL AND pts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_matched,
        |       CAST(sum(CASE WHEN pts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click_only,
        |       CAST(sum(CASE WHEN cts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_only,
        |       count(DISTINCT coalesce(cu, pu)) AS n_users
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_array_setops" ->
      """WITH a AS (
        |  SELECT o_orderpriority AS pri,
        |         list_distinct(list(o_orderkey % 100)) AS sa
        |  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
        |b AS (
        |  SELECT o_orderpriority AS pri,
        |         list_distinct(list(o_orderkey % 100)) AS sb
        |  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
        |SELECT a.pri,
        |       CAST(len(list_distinct(list_concat(sa, sb))) AS BIGINT) AS n_union,
        |       CAST(len(list_filter(sa, x -> list_contains(sb, x))) AS BIGINT)
        |         AS n_intersect,
        |       CAST(len(list_filter(sa, x -> NOT list_contains(sb, x))) AS BIGINT)
        |         AS n_except
        |FROM a JOIN b ON a.pri = b.pri ORDER BY a.pri""".stripMargin,
    "q_map_funcs" ->
      """SELECT o_orderpriority AS pri,
        |       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_keys,
        |       CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
        |       min(o_orderstatus) AS first_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_list_state" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |         CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |                               ORDER BY us DESC, event_id DESC) AS rn
        |  FROM e)
        |SELECT user_id, CAST(sum(cents) AS BIGINT) AS sum3_cents,
        |       count(*) AS n3
        |FROM r WHERE rn <= 3 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_map_state" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS n
        |           FROM events GROUP BY 1, 2)
        |SELECT event_type, count(*) AS n_pairs, CAST(sum(n) AS BIGINT) AS n_events
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pipeline_pretrain" ->
      s"""WITH scored AS (
         |  SELECT *, round((
         |    (CASE WHEN len($ToksSql) BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END) +
         |    (CASE WHEN (length(text) - length(regexp_replace(text, '[^[:alnum:][:space:]]', '', 'g'))) * 1.0
         |           / greatest(length(text), 1) < 0.2 THEN 1.0 ELSE 0.0 END) +
         |    (CASE WHEN list_sum(list_transform($ToksSql, t -> length(t))) * 1.0
         |           / greatest(len($ToksSql), 1) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) +
         |    (CASE WHEN len(list_filter($ToksSql, t -> list_contains(
         |        ['the','a','an','and','or','of','to','in','is','it'], t))) * 1.0
         |           / greatest(len($ToksSql), 1) > 0.0 THEN 1.0 ELSE 0.5 END)) / 4.0, 2) AS q
         |  FROM documents),
         |dd AS (
         |  SELECT *, row_number() OVER (PARTITION BY $FpSql ORDER BY doc_id) AS rn
         |  FROM scored WHERE q >= 0.75),
         |surv AS (SELECT * FROM dd WHERE rn = 1),
         |tkc AS (SELECT doc_id, $ToksSql AS t FROM surv),
         |shc AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(t) <= 8 THEN [array_to_string(t, ' ')]
         |         ELSE list_transform(range(len(t)-7),
         |                i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
         |                     || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] || ' ' || t[i+8]) END)) AS s
         |  FROM tkc),
         |tke AS (SELECT doc_id, $ToksSql AS t FROM documents WHERE doc_id < 20),
         |she AS (
         |  SELECT doc_id AS eid, unnest(list_distinct(
         |    CASE WHEN len(t) <= 8 THEN [array_to_string(t, ' ')]
         |         ELSE list_transform(range(len(t)-7),
         |                i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
         |                     || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] || ' ' || t[i+8]) END)) AS s
         |  FROM tke),
         |contam AS (SELECT DISTINCT shc.doc_id FROM shc JOIN she
         |           ON shc.s = she.s AND shc.doc_id <> she.eid),
         |train AS (SELECT * FROM surv WHERE doc_id >= 20
         |          AND doc_id NOT IN (SELECT doc_id FROM contam)),
         |v AS (
         |  SELECT doc_id, lang, len($ToksSql) AS ntok,
         |         ((doc_id + 29) % 2147483647 * 48271) % 2147483647 % 10000 * 1000000
         |           // (CAST(substring(source, 4) AS INT) % 3 + 1) AS vtime
         |  FROM train),
         |head AS (SELECT * FROM v ORDER BY vtime, doc_id LIMIT 200)
         |SELECT lang, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens
         |FROM head GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_curriculum" ->
      """WITH v AS (
        |  SELECT doc_id, source,
        |         ((doc_id + 17) % 2147483647 * 48271) % 2147483647 % 10000 * 1000000
        |           // (CAST(substring(source, 4) AS INT) % 3 + 1) AS vtime
        |  FROM documents),
        |head AS (SELECT * FROM v ORDER BY vtime, doc_id LIMIT 300)
        |SELECT source, count(*) AS n, CAST(min(vtime) AS BIGINT) AS min_v,
        |       CAST(max(vtime) AS BIGINT) AS max_v
        |FROM head GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_listagg" ->
      """WITH top3 AS (
        |  SELECT o_orderpriority, o_orderkey,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_orderpriority AS pri,
        |       string_agg(CAST(o_orderkey AS VARCHAR), ','
        |                  ORDER BY o_orderkey) AS first_keys
        |FROM top3 WHERE rn <= 3 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_bit_agg" ->
      """SELECT o_orderstatus AS status,
        |       CAST(bit_or(o_orderkey % 4096) AS BIGINT) AS b_or,
        |       CAST(bit_and(o_orderkey % 4096 + 4096) AS BIGINT) AS b_and,
        |       CAST(bit_xor(o_orderkey) AS BIGINT) AS b_xor
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_variant" ->
      """SELECT o_orderpriority AS pri, count(*) AS n,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_c,
        |       CAST(max(o_orderkey) AS BIGINT) AS max_k
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_xml_extract" ->
      """SELECT o_orderstatus AS status, count(*) AS n,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_c
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_k_anonymity" ->
      """WITH g AS (
        |  SELECT lang, source, n_chars // 500 AS len_bucket, count(*) AS group_n
        |  FROM documents GROUP BY 1, 2, 3)
        |SELECT CASE WHEN group_n < 5 THEN '(suppressed)' ELSE lang END AS lang_out,
        |       CAST(sum(group_n) AS BIGINT) AS n_rows
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_epoch_shuffle" ->
      """WITH top AS (
        |  SELECT doc_id, md5(concat('epoch0:', CAST(doc_id AS VARCHAR))) AS h
        |  FROM documents ORDER BY h, doc_id LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS rank,
        |       doc_id, h
        |FROM top ORDER BY rank""".stripMargin,
    "q_posexplode" ->
      """WITH toks AS (
        |  SELECT lang,
        |         unnest(range(0, least(10, len(string_split(text, ' '))))) AS pos,
        |         unnest(string_split(text, ' ')[:10]) AS tok
        |  FROM documents)
        |SELECT lang, CAST(pos AS BIGINT) AS pos, count(*) AS n,
        |       CAST(sum(length(tok)) AS BIGINT) AS sum_len
        |FROM toks GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_tpch_q18" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        |GROUP BY c_custkey, c_name, o_orderkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 20""".stripMargin,
    "q_exists_subq" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |                    AND o2.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_range" ->
      """WITH b AS (
        |  SELECT o_orderpriority,
        |         sum(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER (
        |           PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
        |           RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
        |           AS trail30
        |  FROM orders)
        |SELECT o_orderpriority, count(*) AS n,
        |       CAST(max(trail30) AS BIGINT) AS max_trail30_c,
        |       CAST(min(trail30) AS BIGINT) AS min_trail30_c
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |         AS BIGINT) AS revenue_c
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue_c DESC, n_name""".stripMargin,
    "q_tpch_q6" ->
      """SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT))
        |         AS BIGINT) AS revenue_c,
        |       count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |         AS BIGINT) AS revenue_c
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_c DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q_correlated_subq" ->
      """SELECT o.o_orderpriority AS pri, count(*) AS n_max_orders,
        |       CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_price_c
        |FROM orders o
        |WHERE o.o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
        |                        WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_skew_report" ->
      """WITH c AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
        |           FROM orders GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |             CAST(sum(cnt) AS BIGINT) AS total,
        |             CAST(max(cnt) AS BIGINT) AS max_cnt FROM c),
        |top5 AS (SELECT o_custkey, cnt FROM c
        |         ORDER BY cnt DESC, o_custkey LIMIT 5)
        |SELECT t.o_custkey, t.cnt, s.n_keys,
        |       CAST(s.max_cnt * s.n_keys * 1000000 // s.total AS BIGINT)
        |         AS skew_ppm
        |FROM top5 t CROSS JOIN s ORDER BY t.cnt DESC, t.o_custkey""".stripMargin,
    "q_lang_id" ->
      """WITH scored AS (
        |  SELECT ' ' || trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')) || ' ' AS p
        |  FROM documents),
        |s AS (
        |  SELECT
        |   (length(p)-length(regexp_replace(p,' the ',' ','g')))/4 + (length(p)-length(regexp_replace(p,' and ',' ','g')))/4 + (length(p)-length(regexp_replace(p,' of ',' ','g')))/3 + (length(p)-length(regexp_replace(p,' is ',' ','g')))/3 AS s_en,
        |   (length(p)-length(regexp_replace(p,' el ',' ','g')))/3 + (length(p)-length(regexp_replace(p,' la ',' ','g')))/3 + (length(p)-length(regexp_replace(p,' de ',' ','g')))/3 + (length(p)-length(regexp_replace(p,' que ',' ','g')))/4 AS s_es,
        |   (length(p)-length(regexp_replace(p,' le ',' ','g')))/3 + (length(p)-length(regexp_replace(p,' la ',' ','g')))/3 + (length(p)-length(regexp_replace(p,' et ',' ','g')))/3 + (length(p)-length(regexp_replace(p,' les ',' ','g')))/4 AS s_fr,
        |   (length(p)-length(regexp_replace(p,' der ',' ','g')))/4 + (length(p)-length(regexp_replace(p,' die ',' ','g')))/4 + (length(p)-length(regexp_replace(p,' und ',' ','g')))/4 + (length(p)-length(regexp_replace(p,' ist ',' ','g')))/4 AS s_de
        |  FROM scored)
        |SELECT CASE
        |  WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
        |  WHEN s_es > 0 AND s_es >= s_fr AND s_es >= s_de THEN 'es'
        |  WHEN s_fr > 0 AND s_fr >= s_de THEN 'fr'
        |  WHEN s_de > 0 THEN 'de'
        |  ELSE 'und' END AS pred_lang, count(*) AS n
        |FROM s GROUP BY 1 ORDER BY pred_lang""".stripMargin,
    "q_quality" ->
      s"""WITH f AS (
         |  SELECT len($ToksSql) AS n_tok,
         |    (length(text) - length(regexp_replace(text, '[^[:alnum:][:space:]]', '', 'g'))) * 1.0
         |      / greatest(length(text), 1) AS punct_ratio,
         |    list_sum(list_transform($ToksSql, t -> length(t))) * 1.0
         |      / greatest(len($ToksSql), 1) AS mean_wl,
         |    len(list_filter($ToksSql, t -> list_contains(
         |      ['the','a','an','and','or','of','to','in','is','it'], t))) * 1.0
         |      / greatest(len($ToksSql), 1) AS stop_ratio
         |  FROM documents)
         |SELECT round((
         |    (CASE WHEN n_tok BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END) +
         |    (CASE WHEN punct_ratio < 0.2 THEN 1.0 ELSE 0.0 END) +
         |    (CASE WHEN mean_wl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) +
         |    (CASE WHEN stop_ratio > 0.0 THEN 1.0 ELSE 0.5 END)) / 4.0, 2) AS score,
         |  count(*) AS n
         |FROM f GROUP BY 1 ORDER BY score""".stripMargin,
    "q_token_stats" ->
      s"""SELECT source, CAST(sum(len($ToksSql)) AS BIGINT) AS sum_tokens,
         |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))) AS BIGINT) AS sum_bpe,
         |  floor(avg(n_chars) * 100 + 0.5) / 100 AS avg_chars
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT source, count(*) AS n, CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        |       count(DISTINCT sha256(text)) AS n_distinct_content
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_tfidf_top" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang, unnest($ToksSql) AS term FROM documents),
         |dfreq AS (
         |  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
         |n AS (SELECT count(*) AS nd FROM documents),
         |g AS (SELECT lang, term, count(*) AS n_occurrences FROM toks GROUP BY 1, 2)
         |SELECT lang, rank, term, n_occurrences FROM (
         |  SELECT lang, term, n_occurrences,
         |         row_number() OVER (PARTITION BY lang
         |           ORDER BY n_occurrences * (SELECT nd FROM n) * 1.0 / df DESC,
         |                    term ASC) AS rank
         |  FROM g JOIN dfreq USING (term))
         |WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,
    "q_pipeline_e2e" ->
      s"""WITH scored AS (
         |  SELECT *, round((
         |    (CASE WHEN len($ToksSql) BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.0 END) +
         |    (CASE WHEN (length(text) - length(regexp_replace(text, '[^[:alnum:][:space:]]', '', 'g'))) * 1.0
         |           / greatest(length(text), 1) < 0.2 THEN 1.0 ELSE 0.0 END) +
         |    (CASE WHEN list_sum(list_transform($ToksSql, t -> length(t))) * 1.0
         |           / greatest(len($ToksSql), 1) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) +
         |    (CASE WHEN len(list_filter($ToksSql, t -> list_contains(
         |        ['the','a','an','and','or','of','to','in','is','it'], t))) * 1.0
         |           / greatest(len($ToksSql), 1) > 0.0 THEN 1.0 ELSE 0.5 END)) / 4.0, 2) AS q
         |  FROM documents),
         |deduped AS (
         |  SELECT *, row_number() OVER (PARTITION BY $FpSql ORDER BY doc_id) AS rn
         |  FROM scored WHERE q >= 0.75)
         |SELECT lang, count(*) AS n_docs,
         |       CAST(sum(len($ToksSql)) AS BIGINT) AS n_tokens,
         |       floor(avg(len($ToksSql)) * 100 + 0.5) / 100 AS avg_tokens
         |FROM deduped WHERE rn = 1 GROUP BY lang ORDER BY lang""".stripMargin,
    "q_embed_neardup" ->
      """SELECT count(*) AS n_pairs, floor(avg(c) * 1000 + 0.5) / 1000 AS avg_cos FROM (
        |  SELECT list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                CAST(b.embedding AS DOUBLE[])) AS c
        |  FROM embeddings a JOIN embeddings b
        |    ON a.vec_id < b.vec_id AND a.vec_id < 2000 AND b.vec_id < 2000)
        |WHERE c >= 0.4""".stripMargin,
    "q_hll" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders, true AS within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_hll_sketch_union" ->
      """SELECT CAST(count(DISTINCT lang) AS BIGINT) AS n_shards,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS n_shard_ok,
        |       CAST(count(DISTINCT source) AS BIGINT) AS union_distinct
        |FROM documents""".stripMargin,
    "q_minhash_lsh" -> exactShinglePairsSql("n_neardup_pairs", "avg_j"),
    "q_simhash" ->
      exactShinglePairsSql("n_true_pairs", "avg_j", ", true AS simhash_recall_ok"),
    // connected components over the exact >=0.8 pair graph via recursive
    // min-label propagation (only labels smaller than the target node flow,
    // so the fixpoint is each node's component minimum)
    "q_dup_clusters" ->
      s"""$DupSizesCtesSql
         |SELECT count(*) AS n_groups, CAST(sum(sz) AS BIGINT) AS n_dup_docs,
         |       max(sz) AS max_group_size,
         |       CAST(sum(component) AS BIGINT) AS sum_canonical
         |FROM sizes""".stripMargin,
    "q_dup_histogram" ->
      s"""$DupSizesCtesSql
         |SELECT CAST(sz AS BIGINT) AS group_size, count(*) AS n_groups,
         |       CAST(sum(sz * sz) AS BIGINT) AS sq_doc_weight
         |FROM sizes GROUP BY sz ORDER BY sz""".stripMargin,
    // raw (unrounded) quality sum: exact 0.5 steps, so ORDER BY q DESC,
    // doc_id reproduces keepBest's (score, -id) max_by bit-for-bit
    "q_dedup_keep_best" ->
      s"""WITH ${qualityCtesSql(s", lang, $FpSql AS fp", ", lang, fp")},
         |r AS (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY fp ORDER BY q DESC, doc_id) AS rn
         |  FROM qs)
         |SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM r WHERE rn = 1 GROUP BY lang ORDER BY lang""".stripMargin,
    // two-stage incremental sequence: batch1 vs history, then batch2 vs
    // history + batch1's accepted rows (the extend step's exact semantics)
    "q_incremental_dedup" ->
      s"""WITH fps AS (SELECT doc_id, $FpSql AS fp FROM documents),
         |hist AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 3 = 0),
         |b1 AS (SELECT doc_id, fp FROM fps WHERE doc_id % 3 = 1),
         |k1 AS (SELECT min(doc_id) AS doc_id, fp FROM b1
         |       WHERE fp NOT IN (SELECT fp FROM hist) GROUP BY fp),
         |hist2 AS (SELECT fp FROM hist UNION SELECT fp FROM k1),
         |b2 AS (SELECT doc_id, fp FROM fps WHERE doc_id % 3 = 2),
         |k2 AS (SELECT min(doc_id) AS doc_id, fp FROM b2
         |       WHERE fp NOT IN (SELECT fp FROM hist2) GROUP BY fp),
         |keep AS (SELECT doc_id FROM k1 UNION ALL SELECT doc_id FROM k2)
         |SELECT count(*) AS n_new, CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |       CAST(sum(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b1
         |FROM keep""".stripMargin,
    // split key = the connected component (recursive-CTE min-label chain),
    // singletons fall back to their own id; same Lehmer-bucket split CASE
    // as q_sample_hash. count(DISTINCT split_group) pins group→split.
    "q_group_split" ->
      s"""$DupSizesCtesSql,
         |asg AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS g
         |        FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
         |spl AS (SELECT doc_id, g,
         |          CASE WHEN ((g + 29) % 2147483647 * 48271) % 2147483647 % 10000 < 8000 THEN 'train'
         |               WHEN ((g + 29) % 2147483647 * 48271) % 2147483647 % 10000 < 9000 THEN 'val'
         |               ELSE 'test' END AS split
         |        FROM asg)
         |SELECT split, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |       count(DISTINCT g) AS n_groups
         |FROM spl GROUP BY split ORDER BY split""".stripMargin,
    // the same portable Lehmer-bucket formula as Sampling.bucket — membership
    // must agree bit-for-bit across engines
    "q_sample_hash" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |         ((doc_id + 7) % 2147483647 * 48271) % 2147483647 % 10000 AS bkt,
        |         ((doc_id + 13) % 2147483647 * 48271) % 2147483647 % 10000 AS sbkt
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN sbkt < 8000 THEN 'train'
        |              WHEN sbkt < 9000 THEN 'val' ELSE 'test' END AS split
        |  FROM b
        |  WHERE bkt < CASE WHEN lang = 'en' THEN 5000 ELSE 2500 END)
        |SELECT lang, split, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM s GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,
    // weighted membership: bucket·den < w·10000·num, division-free — the
    // Lehmer bucket identical to q_sample_hash's
    "q_weighted_sample" ->
      """WITH mx AS (SELECT CAST(max(n_chars) AS BIGINT) AS m FROM documents)
        |SELECT lang, count(*) AS n_kept,
        |       CAST(sum(n_chars) AS BIGINT) AS w_sum,
        |       CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents CROSS JOIN mx
        |WHERE ((doc_id + 31) % 2147483647 * 48271) % 2147483647 % 10000
        |        * (4 * m) < n_chars * 10000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // keep-rate thresholds recomputed with the IDENTICAL IEEE op order
    // (share * total / count, then min, then floor(x*10000 + 0.5) ==
    // Scala's math.round for positives); membership = the Lehmer bucket
    "q_domain_mix" ->
      """WITH counts AS (SELECT source, count(*) AS c FROM documents GROUP BY 1),
        |th AS (SELECT source,
        |         CAST(floor(least(1.0, share * 60 / c) * 10000 + 0.5) AS BIGINT) AS t
        |       FROM (SELECT source, c,
        |               CASE source WHEN 'src1' THEN 0.6 WHEN 'src2' THEN 0.3
        |                           WHEN 'src3' THEN 0.1 ELSE NULL END AS share
        |             FROM counts)
        |       WHERE share IS NOT NULL),
        |kept AS (SELECT d.source, d.doc_id FROM documents d JOIN th ON d.source = th.source
        |         WHERE ((d.doc_id + 21) % 2147483647 * 48271) % 2147483647 % 10000 < th.t)
        |SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM kept GROUP BY source ORDER BY source""".stripMargin,
    // whitespace class spelled out because RE2's \s is ASCII-only: it
    // mirrors UnicodeNormalize's Java isWhitespace ∪ SPACE_SEPARATOR set
    // (VT, FS..US, NBSP, ogham/en-quad..hair/narrow/math spaces, line and
    // paragraph separators, ideographic space). Residual divergence: DuckDB
    // lower() is simple case mapping vs Java's (contextual final sigma,
    // dotted İ) — irrelevant for this corpus, documented for the next one.
    "q_text_normalize" ->
      """WITH n AS (
        |  SELECT trim(regexp_replace(lower(nfc_normalize(text)),
        |    '[\t\n\x{000B}\f\r\x{001C}-\x{001F} \x{00A0}\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]+',
        |    ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT count(*) AS n_docs, CAST(sum(length(norm)) AS BIGINT) AS total_len,
        |       count(DISTINCT norm) AS n_distinct
        |FROM n""".stripMargin,
    "q_partitioned_write" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |       CAST(sum(length(text)) AS BIGINT) AS text_len
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_partition_upsert" ->
      """WITH merged AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN doc_id % 4 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000, lang, n_chars FROM documents WHERE doc_id % 10 = 0)
        |SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM merged GROUP BY lang ORDER BY lang""".stripMargin,
    // generate_subscripts + unnest expand in lockstep, giving (pos, x)
    // pairs; list(... ORDER BY pos) reassembles the rounded mean vector
    "q_embed_centroids" ->
      """WITH e AS (
        |  SELECT vec_id % 4 AS grp, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |u AS (
        |  SELECT grp, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e),
        |m AS (SELECT grp, pos, avg(x) AS mx FROM u GROUP BY 1, 2),
        |c AS (SELECT grp,
        |        string_agg(CAST(CAST(floor(mx * 10000 + 0.5) AS BIGINT) AS VARCHAR),
        |                   ',' ORDER BY pos) AS centroid
        |      FROM m GROUP BY 1),
        |n AS (SELECT grp, count(*) AS n FROM e GROUP BY 1)
        |SELECT c.grp, n.n, c.centroid FROM c JOIN n ON c.grp = n.grp ORDER BY c.grp""".stripMargin,
    "q_embed_dispersion" ->
      """WITH e AS (
        |  SELECT vec_id % 4 AS grp, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |u AS (SELECT grp, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e),
        |m AS (SELECT grp, pos, avg(x) AS mx FROM u GROUP BY 1, 2),
        |c AS (SELECT grp, list(mx ORDER BY pos) AS cent FROM m GROUP BY 1),
        |s AS (SELECT e.grp, list_cosine_similarity(e.v, c.cent) AS cos
        |      FROM e JOIN c ON e.grp = c.grp)
        |SELECT grp, count(*) AS n,
        |       floor(avg(cos) * 1000 + 0.5) / 1000 AS avg_cos,
        |       floor(min(cos) * 1000 + 0.5) / 1000 AS min_cos
        |FROM s GROUP BY grp ORDER BY grp""".stripMargin,
    "q_embed_lsh" -> AnnExactSideSql,
    "q_embed_ivf" -> AnnExactSideSql,
    // the eigensolve itself is not SQL-expressible, but its CONTRACT is:
    // whitening must leave every component with mean 0 and variance 1, so
    // the oracle states the mathematically-forced readout — corpus size at
    // the modal dimension, the dimension, and dim-many zero-mean/unit-var
    // components. A broken Jacobi/basis/apply path shows up as a hash
    // mismatch in the last two columns.
    "q_embed_whiten" ->
      """WITH d AS (
        |  SELECT len(embedding) AS d, count(*) AS n
        |  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) > 0
        |  GROUP BY 1 ORDER BY n DESC, d DESC LIMIT 1)
        |SELECT CAST(n AS BIGINT) AS n_vecs, CAST(d AS BIGINT) AS n_components,
        |       CAST(d AS BIGINT) AS n_zero_mean, CAST(d AS BIGINT) AS n_unit_var
        |FROM d""".stripMargin,
    // cells re-derived exactly: centroids = the 8 lowest-id vectors
    // (iterations = 0), argmin over the sequential squared-L2 sum with
    // (dist, cell) tie-break — see qSemanticDedup's scaladoc
    "q_semantic_dedup" ->
      s"""WITH $SemanticPairCtesSql,
         |dropped AS (SELECT DISTINCT idb FROM pairs),
         |kept AS (SELECT e.vec_id, e.label FROM e
         |         LEFT JOIN dropped ON e.vec_id = dropped.idb
         |         WHERE dropped.idb IS NULL)
         |SELECT label, count(*) AS n_kept, CAST(sum(vec_id) AS BIGINT) AS id_sum
         |FROM kept GROUP BY label ORDER BY label""".stripMargin,
    "q_ivf_drift" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
        |          FROM e WHERE vec_id % 2 = 0 ORDER BY vec_id LIMIT 8),
        |odd AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 1),
        |d AS (SELECT o.vec_id, c.cell,
        |        list_sum(list_transform(list_zip(o.v, c.v),
        |          p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
        |      FROM odd o CROSS JOIN cents c),
        |asg AS (SELECT vec_id, cell, dist FROM (
        |          SELECT vec_id, cell, dist,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk
        |          FROM d)
        |        WHERE rk = 1)
        |SELECT CAST(cell AS INTEGER) AS cell, count(*) AS n,
        |       CAST(sum(CAST(floor(dist * 1e12 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS scaled_sum_sqdist
        |FROM asg GROUP BY cell ORDER BY cell""".stripMargin,
    "q_semantic_decontam" ->
      s"""WITH $SemanticPairCtesSql,
         |xp AS (SELECT a.label, a.vec_id AS cid,
         |         list_cosine_similarity(a.v, b.v) AS cos
         |       FROM e a JOIN asg aa ON a.vec_id = aa.vec_id
         |            JOIN asg bb ON aa.cell = bb.cell
         |            JOIN e b ON b.vec_id = bb.vec_id
         |       WHERE a.vec_id % 10 <> 0 AND b.vec_id % 10 = 0
         |         AND list_cosine_similarity(a.v, b.v) >= 0.4)
         |SELECT label, count(*) AS n_pairs, count(DISTINCT cid) AS n_flagged,
         |       floor(avg(cos) * 1000 + 0.5) / 1000 AS avg_cos
         |FROM xp GROUP BY label ORDER BY label""".stripMargin,
    "q_embed_pq" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |base AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
        |         FROM e ORDER BY vec_id LIMIT 16),
        |blk AS (SELECT unnest(generate_series(0, 3)) AS b),
        |cb AS (SELECT b, cell, v[(b*16+1):(b*16+16)] AS c FROM base CROSS JOIN blk),
        |sub AS (SELECT vec_id, label, b, v[(b*16+1):(b*16+16)] AS s FROM e CROSS JOIN blk),
        |d AS (SELECT sub.vec_id, sub.label, sub.b, cb.cell,
        |        list_sum(list_transform(list_zip(sub.s, cb.c),
        |          p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
        |      FROM sub JOIN cb ON sub.b = cb.b),
        |asg AS (SELECT vec_id, label, cell, dist FROM (
        |          SELECT *, row_number() OVER (PARTITION BY vec_id, b ORDER BY dist, cell) AS rk
        |          FROM d)
        |        WHERE rk = 1),
        |per AS (SELECT vec_id, label,
        |          CAST(sum(CAST(floor(dist * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS se,
        |          max(cell) AS mc, count(*) AS nb
        |        FROM asg GROUP BY 1, 2)
        |SELECT label, count(*) AS n, CAST(sum(se) AS BIGINT) AS sum_scaled_sqerr,
        |       CAST(max(mc) AS BIGINT) AS max_code, CAST(min(nb) AS BIGINT) AS code_len
        |FROM per GROUP BY label ORDER BY label""".stripMargin,
    // the shared cell/pair chain + the shared quality CTEs; loser of a
    // pair = lesser (q, -id)
    "q_semantic_keepbest" ->
      s"""WITH $SemanticPairCtesSql,
         |${qualityCtesSql()},
         |losers AS (SELECT DISTINCT CASE WHEN qa.q < qb.q THEN ida ELSE idb END AS lid
         |           FROM pairs JOIN qs qa ON ida = qa.doc_id JOIN qs qb ON idb = qb.doc_id),
         |kept AS (SELECT e.vec_id, e.label FROM e
         |         LEFT JOIN losers ON e.vec_id = losers.lid
         |         WHERE losers.lid IS NULL)
         |SELECT label, count(*) AS n_kept, CAST(sum(vec_id) AS BIGINT) AS id_sum
         |FROM kept GROUP BY label ORDER BY label""".stripMargin,
    // d (all-vector distances to every centroid) doubles as the query
    // tables: queries are corpus members, so qt is just its vec_id < 10
    // slice, scaled; a neighbor's ADC = its 4 (block, cell) lookups
    "q_embed_adc" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |base AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
        |         FROM e ORDER BY vec_id LIMIT 16),
        |blk AS (SELECT unnest(generate_series(0, 3)) AS b),
        |cb AS (SELECT b, cell, v[(b*16+1):(b*16+16)] AS c FROM base CROSS JOIN blk),
        |sub AS (SELECT vec_id, b, v[(b*16+1):(b*16+16)] AS s FROM e CROSS JOIN blk),
        |d AS (SELECT sub.vec_id, sub.b, cb.cell,
        |        list_sum(list_transform(list_zip(sub.s, cb.c),
        |          p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
        |      FROM sub JOIN cb ON sub.b = cb.b),
        |asg AS (SELECT vec_id, b, cell FROM (
        |          SELECT *, row_number() OVER (PARTITION BY vec_id, b ORDER BY dist, cell) AS rk
        |          FROM d)
        |        WHERE rk = 1),
        |qt AS (SELECT vec_id AS query_id, b, cell,
        |         CAST(floor(dist * 1e12 + 0.5) AS BIGINT) AS sd
        |       FROM d WHERE vec_id < 10),
        |adc AS (SELECT qt.query_id, asg.vec_id AS neighbor_id,
        |          CAST(sum(qt.sd) AS BIGINT) AS scaled_adc
        |        FROM asg JOIN qt ON asg.b = qt.b AND asg.cell = qt.cell
        |        WHERE qt.query_id <> asg.vec_id
        |        GROUP BY 1, 2),
        |r AS (SELECT query_id, neighbor_id, scaled_adc,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY scaled_adc, neighbor_id) AS rank
        |      FROM adc)
        |SELECT query_id, rank, neighbor_id, scaled_adc FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    // coarse routing (16 full-vector cells, probe top-4 by (dist, cell))
    // + the PQ code/table machinery of q_embed_adc; both quantizers
    // derive from the SAME 16 lowest-id vectors (iterations = 0)
    "q_embed_ivfpq" -> (IvfPqCtesSql +
      "\nSELECT query_id, rank, neighbor_id, scaled_adc FROM r WHERE rank <= 5" +
      "\nORDER BY query_id, rank"),
    "q_ann_rerank" -> (IvfPqCtesSql +
      """,
        |c20 AS (SELECT query_id, neighbor_id FROM r WHERE rank <= 20),
        |rr AS (SELECT c.query_id, c.neighbor_id,
        |         CAST(row_number() OVER (PARTITION BY c.query_id
        |           ORDER BY list_cosine_similarity(en.v, eq.v) DESC,
        |                    c.neighbor_id) AS BIGINT) AS rank
        |       FROM c20 c JOIN e en ON en.vec_id = c.neighbor_id
        |            JOIN e eq ON eq.vec_id = c.query_id)
        |SELECT query_id, rank, neighbor_id FROM rr WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin),
    "q_rolling_fingerprint" ->
      """WITH u AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0)
        |SELECT (SELECT count(*) FROM u a JOIN u b
        |          ON a.text = b.text AND a.doc_id < b.doc_id) AS n_exact_dup_pairs,
        |       (SELECT count(*) FROM u) AS n_docs""".stripMargin,
    // pure integer arithmetic mirror of the synthetic-PNG pixel formula
    // (Multimodal.syntheticPng): channel c at (x,y) = (id*31+x*7+y*13+c*101)%256;
    // PNG is lossless so the real ImageIO decode recovers these exactly
    "q_multimodal_features" ->
      """WITH ok AS (
        |  SELECT doc_id, 8 + doc_id % 8 AS w, 6 + doc_id % 6 AS h
        |  FROM documents WHERE doc_id % 10 <> 0),
        |g AS (
        |  SELECT doc_id, w, h,
        |    list_sum(flatten(list_transform(range(h), y ->
        |      list_transform(range(w), x ->
        |        (doc_id*31 + x*7 + y*13) % 256
        |        + (doc_id*31 + x*7 + y*13 + 101) % 256
        |        + (doc_id*31 + x*7 + y*13 + 202) % 256)))) AS gs
        |  FROM ok),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_ok,
        |         CAST(sum(w) AS BIGINT) AS sum_w, CAST(sum(h) AS BIGINT) AS sum_h,
        |         CAST(sum(gs) AS BIGINT) AS total_gray,
        |         CAST(sum(w*h) AS BIGINT) AS total_pix
        |  FROM g)
        |SELECT (SELECT count(*) FROM documents) AS n, n_ok,
        |       (SELECT count(*) FROM documents WHERE doc_id % 10 = 0) AS n_err,
        |       sum_w, sum_h, n_ok AS n_rgb, total_gray, total_pix,
        |       floor(total_gray / (765.0 * total_pix) * 1000000 + 0.5) / 1000000
        |         AS mean_luma,
        |       true AS blocks_exact
        |FROM tot""".stripMargin,
    // pure integer arithmetic mirror of the synthetic-WAV sample formula
    // (Multimodal.syntheticWav): sample at (frame t, channel c) =
    // (id*31 + t*7919 + c*13) % 65536 - 32768; PCM is lossless so the real
    // javax.sound decode recovers these exactly
    "q_audio_features" ->
      """WITH ok AS (
        |  SELECT doc_id, 50 + doc_id % 50 AS nf, 1 + doc_id % 2 AS ch
        |  FROM documents WHERE doc_id % 10 <> 0),
        |s AS (
        |  SELECT doc_id, nf, ch,
        |    flatten(list_transform(range(nf), t ->
        |      list_transform(range(ch), c ->
        |        (doc_id*31 + t*7919 + c*13) % 65536 - 32768))) AS sm
        |  FROM ok),
        |per AS (
        |  SELECT doc_id, nf, ch, nf * ch AS ns,
        |    list_max(list_transform(sm, s -> abs(s))) AS pk,
        |    list_sum(list_transform(sm, s -> abs(s))) AS sa,
        |    list_sum(list_transform(sm, s -> s * s)) AS sq,
        |    list_sum(list_transform(sm, s ->
        |      CASE WHEN least(abs(s) * 8 // 32768, 7) = 0 THEN 1 ELSE 0 END)) AS h0,
        |    list_sum(list_transform(sm, s ->
        |      CASE WHEN least(abs(s) * 8 // 32768, 7) = 7 THEN 1 ELSE 0 END)) AS h7
        |  FROM s)
        |SELECT (SELECT count(*) FROM documents) AS n, count(*) AS n_ok,
        |       (SELECT count(*) FROM documents WHERE doc_id % 10 = 0) AS n_err,
        |       CAST(count(*) * 8000 AS BIGINT) AS sum_rate,
        |       CAST(sum(ch) AS BIGINT) AS sum_channels,
        |       CAST(sum(nf) AS BIGINT) AS total_frames,
        |       CAST(sum(ns) AS BIGINT) AS total_samples,
        |       CAST(max(pk) AS BIGINT) AS max_peak,
        |       CAST(sum(sa) AS BIGINT) AS total_abs,
        |       CAST(sum(sq) AS BIGINT) AS total_sq,
        |       floor(sum(sa) / (32768.0 * sum(ns)) * 1000000 + 0.5) / 1000000
        |         AS mean_level,
        |       true AS hist_exact,
        |       CAST(sum(h0) AS BIGINT) AS hist_lo,
        |       CAST(sum(h7) AS BIGINT) AS hist_hi
        |FROM per""".stripMargin,
    // pure integer mirror of the synthetic-GIF frame formula
    // (Multimodal.syntheticGif): pixel at (frame f, x, y) =
    // (id*31 + f*17 + x*7 + y*13) % 256 on all three channels; the GIF
    // palette is lossless for <=256 colors so the real multi-frame
    // decode recovers these exactly, and the sampled indexes are
    // f * nFrames // k (k = least(4, nFrames)) — the operator's arithmetic
    "q_video_frames" ->
      """WITH ok AS (
        |  SELECT doc_id, 5 + doc_id % 5 AS w, 4 + doc_id % 4 AS h,
        |         3 + doc_id % 6 AS nf, least(4, 3 + doc_id % 6) AS k
        |  FROM documents WHERE doc_id % 10 <> 0),
        |fr AS (
        |  SELECT doc_id, w, h, nf,
        |         unnest(list_transform(range(k), f -> f * nf // k)) AS idx
        |  FROM ok),
        |g AS (
        |  SELECT doc_id, idx,
        |    list_sum(flatten(list_transform(range(h), y ->
        |      list_transform(range(w), x ->
        |        3 * ((doc_id*31 + idx*17 + x*7 + y*13) % 256))))) AS fg
        |  FROM fr),
        |per AS (
        |  SELECT doc_id, count(*) AS ks, sum(fg) AS tg, sum(idx) AS ti
        |  FROM g GROUP BY doc_id)
        |SELECT (SELECT count(*) FROM documents) AS n,
        |       (SELECT count(*) FROM ok) AS n_ok,
        |       (SELECT count(*) FROM documents WHERE doc_id % 10 = 0) AS n_err,
        |       (SELECT CAST(sum(w) AS BIGINT) FROM ok) AS sum_w,
        |       (SELECT CAST(sum(h) AS BIGINT) FROM ok) AS sum_h,
        |       (SELECT CAST(sum(nf) AS BIGINT) FROM ok) AS total_frames,
        |       CAST(sum(ks) AS BIGINT) AS total_sampled,
        |       CAST(sum(tg) AS BIGINT) AS total_gray,
        |       CAST(sum(ti) AS BIGINT) AS idx_sum,
        |       true AS shape_exact, true AS sample_exact
        |FROM per""".stripMargin,
    "q_repetition" ->
      s"""SELECT source,
         |  floor(avg((len($ToksSql) - len(list_distinct($ToksSql))) * 1.0
         |            / greatest(len($ToksSql), 1)) * 10000 + 0.5) / 10000 AS avg_rep,
         |  count(*) FILTER (WHERE (len($ToksSql) - len(list_distinct($ToksSql))) * 1.0
         |            / greatest(len($ToksSql), 1) > 0.2) AS n_repetitive
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_pii_redact" ->
      """WITH inj AS (
        |  SELECT CASE WHEN doc_id % 10 = 0
        |    THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
        |              || '@example.com or call +1 555 123 4567'
        |    ELSE text END AS t
        |  FROM documents),
        |red AS (
        |  SELECT t, regexp_replace(
        |           regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |           '\+?\d[\d -]{7,}\d', '<PHONE>', 'g') AS rt
        |  FROM inj)
        |SELECT
        |  count(*) FILTER (WHERE regexp_matches(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_docs_with_pii,
        |  count(*) FILTER (WHERE regexp_matches(rt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
        |                      OR regexp_matches(rt, '\+?\d[\d -]{7,}\d')) AS n_after_redact,
        |  CAST(sum(length(t) - length(rt)) AS BIGINT) AS chars_removed
        |FROM red""".stripMargin,
    "q_decontaminate" ->
      s"""WITH tk AS (SELECT doc_id, $ToksSql AS t FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(t) <= 8 THEN [array_to_string(t, ' ')]
         |         ELSE list_transform(range(len(t)-7),
         |                i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
         |                     || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] || ' ' || t[i+8]) END)) AS s
         |  FROM tk),
         |es AS (SELECT doc_id AS eid, s FROM sh WHERE doc_id < 20),
         |c AS (SELECT DISTINCT sh.doc_id FROM sh JOIN es ON sh.s = es.s AND sh.doc_id <> es.eid)
         |SELECT count(*) AS n_contaminated,
         |       CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS sum_ids FROM c""".stripMargin,
    "q_multimodal_frames" ->
      """WITH d AS (SELECT text, strlen(text) AS L FROM documents),
        |f AS (SELECT text, L, greatest(1, least(4, L)) AS n FROM d),
        |g AS (SELECT text, L, n, greatest(1, L // n) AS step FROM f),
        |fr AS (SELECT text, L, step, unnest(range(n)) AS fi FROM g),
        |fx AS (
        |  SELECT least(step, L - fi * step) AS len,
        |         substr(sha256(substr(text, CAST(fi * step + 1 AS BIGINT),
        |                              CAST(least(step, L - fi * step) AS BIGINT))), 1, 8) AS sha8
        |  FROM fr)
        |SELECT count(*) AS n_frames, CAST(sum(len) AS BIGINT) AS total_len,
        |       count(DISTINCT sha8) AS n_digests
        |FROM fx""".stripMargin,
    "q_embed_topk" ->
      """SELECT query_id, rank, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         row_number() OVER (PARTITION BY q.vec_id
        |           ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                           CAST(c.embedding AS DOUBLE[])) DESC,
        |                    c.vec_id ASC) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // the oracle affords a single-threaded window cumsum at oracle scale;
    // the Spark side MUST NOT (see Packing's two-pass prefix sum)
    "q_seq_pack" ->
      s"""WITH tok AS (SELECT doc_id, len($ToksSql) AS tokens FROM documents),
         |c AS (SELECT doc_id, tokens,
         |        COALESCE(sum(tokens) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
         |      FROM tok),
         |b AS (SELECT doc_id, tokens, cum_excl, cum_excl // 512 AS bin,
         |        CASE WHEN tokens > 0
         |               AND (cum_excl + tokens - 1) // 512 <> cum_excl // 512
         |             THEN 1 ELSE 0 END AS crosses
         |      FROM c)
         |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
         |       CAST(sum(tokens) AS BIGINT) AS bin_tokens,
         |       CAST(sum(crosses) AS BIGINT) AS n_crossing,
         |       CAST(min(cum_excl) AS BIGINT) AS first_offset
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "q_chunk_split" ->
      s"""WITH tok AS (SELECT doc_id, lang, $ToksSql AS toks FROM documents),
         |n AS (SELECT doc_id, lang, toks, len(toks) AS n FROM tok WHERE len(toks) > 0),
         |ch AS (
         |  SELECT lang, toks[(gs.i*24+1):least(gs.i*24+32, n)] AS ctoks
         |  FROM n, LATERAL (SELECT unnest(generate_series(0,
         |       CASE WHEN n <= 32 THEN 0 ELSE (n - 32 + 24 - 1)//24 END)) AS i) gs)
         |SELECT lang, count(*) AS n_chunks,
         |       CAST(sum(len(ctoks)) AS BIGINT) AS sum_chunk_tokens,
         |       CAST(sum(CASE WHEN len(ctoks) = 32 THEN 1 ELSE 0 END) AS BIGINT) AS n_full,
         |       count(DISTINCT array_to_string(ctoks, ' ')) AS n_distinct_chunks
         |FROM ch GROUP BY lang ORDER BY lang""".stripMargin,
    "q_common_ngrams" ->
      s"""WITH tok AS (SELECT doc_id, lang, $ToksSql AS toks FROM documents),
         |g AS (
         |  SELECT doc_id, lang, array_to_string(toks[(gs.i+1):(gs.i+3)], ' ') AS ngram
         |  FROM (SELECT doc_id, lang, toks, len(toks) - 2 AS c FROM tok) t,
         |       LATERAL (SELECT unnest(generate_series(0, c - 1)) AS i) gs
         |  WHERE c > 0),
         |dg AS (SELECT DISTINCT doc_id, lang, ngram FROM g),
         |dfreq AS (SELECT ngram, count(*) AS df FROM dg GROUP BY ngram),
         |common AS (SELECT ngram FROM dfreq
         |           WHERE df >= greatest(2, ceil(0.01 * (SELECT count(*) FROM documents)))),
         |per_doc AS (
         |  SELECT d.doc_id, d.lang, count(*) AS n_grams,
         |         sum(CASE WHEN c.ngram IS NOT NULL THEN 1 ELSE 0 END) AS n_common
         |  FROM dg d LEFT JOIN common c USING (ngram) GROUP BY 1, 2)
         |SELECT lang, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN n_common * 1.0 / n_grams >= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |       CAST(sum(CAST(floor(n_common * 1e6 / n_grams + 0.5) AS BIGINT)) AS BIGINT) AS sum_scaled_share
         |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin,
    "q_embed_quantize" ->
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |s AS (SELECT vec_id, label, e,
        |        list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM v),
        |qz AS (SELECT vec_id, label, e, scale,
        |         list_transform(e, x -> CASE WHEN scale > 0
        |           THEN floor(x / scale + 0.5) ELSE 0 END) AS q
        |       FROM s),
        |err AS (SELECT label,
        |          list_sum(list_transform(list_zip(e, q),
        |            p -> (p[1] - p[2] * scale) * (p[1] - p[2] * scale))) AS sqerr,
        |          list_max(list_transform(q, x -> abs(x))) AS maxq
        |        FROM qz)
        |SELECT label, count(*) AS n,
        |       CAST(sum(CAST(floor(sqerr * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS sum_scaled_sqerr,
        |       CAST(max(maxq) AS BIGINT) AS max_abs_code,
        |       CAST(sum(CASE WHEN maxq = 127 THEN 1 ELSE 0 END) AS BIGINT) AS n_saturated
        |FROM err GROUP BY label ORDER BY label""".stripMargin,
    "q_embed_prep" ->
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |n1 AS (SELECT vec_id, label,
        |         CASE WHEN list_sum(list_transform(e, x -> x*x)) > 0
        |              THEN list_transform(e, x -> x / sqrt(list_sum(list_transform(e, y -> y*y))))
        |              ELSE e END AS u
        |       FROM v),
        |n2 AS (SELECT vec_id, label,
        |         CASE WHEN list_sum(list_transform(u[1:32], x -> x*x)) > 0
        |              THEN list_transform(u[1:32], x -> x / sqrt(list_sum(list_transform(u[1:32], y -> y*y))))
        |              ELSE u[1:32] END AS m
        |       FROM n1),
        |s AS (SELECT vec_id, label, m,
        |        list_max(list_transform(m, x -> abs(x))) / 127.0 AS scale FROM n2),
        |qz AS (SELECT vec_id, label, m, scale,
        |         list_transform(m, x -> CASE WHEN scale > 0
        |           THEN floor(x / scale + 0.5) ELSE 0 END) AS q
        |       FROM s),
        |err AS (SELECT label,
        |          list_sum(list_transform(list_zip(m, q),
        |            p -> (p[1] - p[2] * scale) * (p[1] - p[2] * scale))) AS sqerr,
        |          list_max(list_transform(q, x -> abs(x))) AS maxq,
        |          list_sum(list_transform(m, x -> x * x)) AS sqn
        |        FROM qz)
        |SELECT label, count(*) AS n,
        |       CAST(sum(CAST(floor(sqerr * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS sum_scaled_sqerr,
        |       CAST(max(maxq) AS BIGINT) AS max_abs_code,
        |       CAST(sum(CASE WHEN maxq = 127 THEN 1 ELSE 0 END) AS BIGINT) AS n_saturated,
        |       CAST(sum(CAST(floor(sqn * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS sum_scaled_sqnorm
        |FROM err GROUP BY label ORDER BY label""".stripMargin,
    "q_unigram_lm" ->
      s"""WITH tok AS (SELECT doc_id, lang, unnest($ToksSql) AS t FROM documents),
         |vocab AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
         |scored AS (SELECT doc_id, lang, count(*) AS n,
         |             sum(CAST(floor(ln(cnt) * 1e6 + 0.5) AS BIGINT)) AS s
         |           FROM tok JOIN vocab USING (t) GROUP BY 1, 2),
         |d AS (SELECT lang, n,
         |        s - n * CAST(floor(ln((SELECT total FROM tot)) * 1e6 + 0.5) AS BIGINT) AS lp
         |      FROM scored)
         |SELECT lang, count(*) AS n_docs, CAST(sum(lp) AS BIGINT) AS sum_scaled_lp,
         |       CAST(sum(CASE WHEN lp > -3401000 * n THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    "q_ppl_buckets" ->
      s"""WITH tok AS (SELECT doc_id, lang, unnest($ToksSql) AS t FROM documents),
         |vocab AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
         |scored AS (SELECT doc_id, lang, count(*) AS n,
         |             sum(CAST(floor(ln(cnt) * 1e6 + 0.5) AS BIGINT)) AS s
         |           FROM tok JOIN vocab USING (t) GROUP BY 1, 2),
         |d AS (SELECT doc_id, lang, n,
         |        s - n * CAST(floor(ln((SELECT total FROM tot)) * 1e6 + 0.5) AS BIGINT) AS lp
         |      FROM scored),
         |b AS (SELECT doc_id, lang, n, lp,
         |        ntile(3) OVER (PARTITION BY lang
         |          ORDER BY CAST(lp AS DOUBLE) / n DESC, doc_id) AS nt
         |      FROM d)
         |SELECT lang,
         |       CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
         |       count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS sum_tokens,
         |       CAST(sum(lp) AS BIGINT) AS sum_scaled_lp,
         |       CAST(min(doc_id) AS BIGINT) AS min_doc
         |FROM b GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,
    "q_external_lm" ->
      s"""WITH tokA AS (SELECT unnest($ToksSql) AS t FROM documents WHERE doc_id % 2 = 0),
         |vocab AS (SELECT t, count(*) AS cnt FROM tokA GROUP BY t),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
         |tokB AS (SELECT doc_id, lang, unnest($ToksSql) AS t FROM documents WHERE doc_id % 2 = 1),
         |scored AS (SELECT b.doc_id, b.lang, count(*) AS n,
         |             sum(CASE WHEN v.cnt IS NULL THEN 1 ELSE 0 END) AS oov,
         |             sum(coalesce(CAST(floor(ln(v.cnt) * 1e6 + 0.5) AS BIGINT), 0)) AS s
         |           FROM tokB b LEFT JOIN vocab v USING (t) GROUP BY 1, 2),
         |d AS (SELECT lang, n, oov,
         |        s - n * CAST(floor(ln((SELECT total FROM tot)) * 1e6 + 0.5) AS BIGINT) AS lp
         |      FROM scored)
         |SELECT lang, count(*) AS n_docs, CAST(sum(lp) AS BIGINT) AS sum_scaled_lp,
         |       CAST(sum(oov) AS BIGINT) AS sum_oov,
         |       CAST(sum(CASE WHEN oov > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_oov
         |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    "q_dsir" ->
      s"""WITH tokP AS (SELECT unnest($ToksSql) AS t FROM documents
         |             WHERE doc_id % 3 = 0 AND lang = 'en'),
         |vp AS (SELECT t, count(*) AS cp FROM tokP GROUP BY t),
         |tokQ AS (SELECT unnest($ToksSql) AS t FROM documents WHERE doc_id % 3 = 1),
         |vq AS (SELECT t, count(*) AS cq FROM tokQ GROUP BY t),
         |totp AS (SELECT coalesce(CAST(floor(ln(sum(cp)) * 1e6 + 0.5) AS BIGINT), 0) AS sp FROM vp),
         |totq AS (SELECT coalesce(CAST(floor(ln(sum(cq)) * 1e6 + 0.5) AS BIGINT), 0) AS sq FROM vq),
         |m AS (SELECT coalesce(vp.t, vq.t) AS t,
         |        coalesce(CAST(floor(ln(cp) * 1e6 + 0.5) AS BIGINT), 0)
         |      - coalesce(CAST(floor(ln(cq) * 1e6 + 0.5) AS BIGINT), 0) AS delta,
         |        (cp IS NULL) AS oovp, (cq IS NULL) AS oovq
         |      FROM vp FULL OUTER JOIN vq ON vp.t = vq.t),
         |tokC AS (SELECT doc_id, lang, unnest($ToksSql) AS t FROM documents
         |         WHERE doc_id % 3 = 2),
         |sc AS (SELECT c.doc_id, c.lang, count(*) AS n,
         |         sum(CASE WHEN m.t IS NULL OR m.oovp THEN 1 ELSE 0 END) AS oovt,
         |         sum(CASE WHEN m.t IS NULL OR m.oovq THEN 1 ELSE 0 END) AS oovr,
         |         sum(coalesce(m.delta, 0)) AS sd
         |       FROM tokC c LEFT JOIN m ON c.t = m.t GROUP BY 1, 2)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, CAST(n AS BIGINT) AS n_tokens,
         |       CAST(oovt AS BIGINT) AS n_oov_target, CAST(oovr AS BIGINT) AS n_oov_raw,
         |       CAST(sd - n * ((SELECT sp FROM totp) - (SELECT sq FROM totq)) AS BIGINT)
         |         AS scaled_weight
         |FROM sc ORDER BY scaled_weight DESC, doc_id LIMIT 50""".stripMargin,
    "q_group_sample" ->
      """SELECT lang, sample_rank, doc_id FROM (
        |  SELECT lang, doc_id,
        |         CAST(row_number() OVER (PARTITION BY lang
        |           ORDER BY md5('s1:' || CAST(doc_id AS VARCHAR)), doc_id)
        |           AS BIGINT) AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 20 ORDER BY lang, sample_rank""".stripMargin,
    "q_hard_negatives" ->
      """SELECT anchor_id, rank, negative_id, neg_label FROM (
        |  SELECT a.vec_id AS anchor_id, c.vec_id AS negative_id,
        |         CAST(c.label AS BIGINT) AS neg_label,
        |         row_number() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |             CAST(a.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
        |  FROM embeddings a JOIN embeddings c
        |    ON a.vec_id < 10 AND c.label <> a.label
        |  WHERE list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |          CAST(a.embedding AS DOUBLE[])) < 0.99)
        |WHERE rank <= 5 ORDER BY anchor_id, rank""".stripMargin,
    "q_c4_clean" -> C4CleanOracleSql,
    "q_streaming_c4" -> C4CleanOracleSql,
    "q_quality_classifier" -> QualityClassifierOracleSql,
    "q_quality_calibration" ->
      s"""WITH $ClassifierScoredCtesSql,
         |d2 AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, sc FROM d),
         |th AS (SELECT unnest([-2000000, -1000000, 0, 1000000, 2000000]) AS threshold)
         |SELECT CAST(threshold AS BIGINT) AS threshold,
         |       CAST(sum(CASE WHEN y = 1 AND sc > threshold THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |       CAST(sum(CASE WHEN y = 0 AND sc > threshold THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |       CAST(sum(CASE WHEN y = 1 AND sc <= threshold THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |       CAST(sum(CASE WHEN y = 0 AND sc <= threshold THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |FROM d2 CROSS JOIN th GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_streaming_classify" -> QualityClassifierOracleSql,
    "q_corpus_diff" ->
      """WITH old AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 0 THEN text || ' legacy' ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 9 = 0),
        |j AS (SELECT coalesce(o.doc_id, n.doc_id) AS id,
        |        CASE WHEN o.doc_id IS NULL THEN 'added'
        |             WHEN n.doc_id IS NULL THEN 'removed'
        |             WHEN o.text = n.text THEN 'unchanged'
        |             ELSE 'changed' END AS status
        |      FROM old o FULL OUTER JOIN documents n ON o.doc_id = n.doc_id)
        |SELECT status, count(*) AS n, CAST(min(id) AS BIGINT) AS min_id,
        |       CAST(max(id) AS BIGINT) AS max_id
        |FROM j GROUP BY 1 ORDER BY status""".stripMargin,
    "q_url_blocklist" ->
      """WITH d AS (SELECT doc_id, lang,
        |       CASE WHEN doc_id % 5 = 0
        |            THEN 'cdn.site-' || CAST(doc_id % 20 AS VARCHAR) || '.example.org'
        |            ELSE 'site-' || CAST(doc_id % 20 AS VARCHAR) || '.example.org' END AS host
        |     FROM documents),
        |bl AS (SELECT unnest(['site-3.example.org', 'site-7.example.org',
        |                      'bad.example.net']) AS dom),
        |f AS (SELECT d.doc_id, d.lang, count(b.dom) > 0 AS blocked
        |      FROM d LEFT JOIN bl b ON d.host = b.dom OR d.host LIKE '%.' || b.dom
        |      GROUP BY 1, 2)
        |SELECT lang, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
        |       CAST(min(CASE WHEN blocked THEN doc_id END) AS BIGINT) AS min_blocked
        |FROM f GROUP BY 1 ORDER BY lang""".stripMargin,
    "q_bpe_train" -> bpeOracleSql(3),
    "q_bpe_batched" -> bpeBatchedOracleSql(merges = 16, k = 8, maxRounds = 8),
    "q_bpe_apply" -> bpeApplyOracleSql(3),
    "q_bpe_pairs" ->
      s"""WITH tok AS (SELECT unnest($ToksSql) AS w FROM documents),
         |vocab AS (SELECT w, count(*) AS cnt FROM tok GROUP BY 1),
         |p AS (SELECT substring(w, gs.i, 2) AS pair, w, cnt
         |      FROM vocab, LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i) gs
         |      WHERE length(w) >= 2)
         |SELECT pair, CAST(count(DISTINCT w) AS BIGINT) AS n_types,
         |       CAST(sum(cnt) AS BIGINT) AS n_occurrences
         |FROM p GROUP BY 1 ORDER BY n_occurrences DESC, pair LIMIT 20""".stripMargin,
    "q_collocations" ->
      s"""WITH tk AS (SELECT $ToksSql AS t FROM documents),
         |pr AS (SELECT t[gs.i] AS u, t[gs.i + 1] AS v
         |       FROM tk, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) gs
         |       WHERE len(t) >= 2),
         |bc AS (SELECT u, v, count(*) AS cnt FROM pr GROUP BY 1, 2),
         |pc AS (SELECT u, count(*) AS cu FROM pr GROUP BY 1),
         |sc AS (SELECT v, count(*) AS cv FROM pr GROUP BY 1),
         |n2 AS (SELECT count(*) AS n FROM pr)
         |SELECT u AS w1, v AS w2, CAST(cnt AS BIGINT) AS cnt,
         |       CAST(floor(ln(cnt) * 1e6 + 0.5) AS BIGINT)
         |     + CAST(floor(ln((SELECT n FROM n2)) * 1e6 + 0.5) AS BIGINT)
         |     - CAST(floor(ln(cu) * 1e6 + 0.5) AS BIGINT)
         |     - CAST(floor(ln(cv) * 1e6 + 0.5) AS BIGINT) AS scaled_pmi
         |FROM bc JOIN pc USING (u) JOIN sc USING (v)
         |WHERE cnt >= 5
         |ORDER BY scaled_pmi DESC, w1, w2 LIMIT 20""".stripMargin,
    "q_substring_dedup" ->
      s"""WITH tk AS (SELECT doc_id, lang, $ToksSql AS t FROM documents),
         |cp AS (SELECT doc_id + 1000000 AS doc_id, lang, t[1:((len(t)*9+9)//10)] AS t
         |       FROM tk WHERE doc_id % 10 = 0),
         |corpus AS (SELECT doc_id, lang, t FROM tk
         |           UNION ALL SELECT doc_id, lang, t FROM cp),
         |nn AS (SELECT doc_id, lang, t, len(t) AS n FROM corpus WHERE len(t) >= 1),
         |w AS (SELECT doc_id, lang, n, gs.i AS pos,
         |        array_to_string(t[(gs.i+1):(gs.i+least(8, n))], ' ') AS s
         |      FROM nn, LATERAL (SELECT unnest(generate_series(0,
         |        CASE WHEN n <= 8 THEN 0 ELSE n - 8 END)) AS i) gs),
         |m AS (SELECT doc_id, lang, n, pos,
         |        row_number() OVER (PARTITION BY s ORDER BY doc_id, pos) AS rk,
         |        count(*) OVER (PARTITION BY s) AS c
         |      FROM w),
         |mk AS (SELECT doc_id, lang, n, pos, least(pos + 8, n) AS e
         |       FROM m WHERE c > 1 AND rk > 1),
         |sw AS (SELECT doc_id, lang, n, pos, e,
         |         max(e) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
         |       FROM mk),
         |g AS (SELECT doc_id, lang, n, pos, e,
         |        sum(CASE WHEN pme IS NULL OR pos > pme THEN 1 ELSE 0 END)
         |          OVER (PARTITION BY doc_id ORDER BY pos
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |      FROM sw),
         |spans AS (SELECT doc_id, lang, n, grp, min(pos) AS st, max(e) AS en
         |          FROM g GROUP BY 1, 2, 3, 4),
         |stats AS (SELECT doc_id, lang, n, count(*) AS ns, sum(en - st) AS dt
         |          FROM spans GROUP BY 1, 2, 3)
         |SELECT lang, count(*) AS n_docs_flagged,
         |       CAST(sum(ns) AS BIGINT) AS n_spans,
         |       CAST(sum(dt) AS BIGINT) AS sum_dup_tokens,
         |       CAST(sum(n) AS BIGINT) AS sum_tokens_flagged
         |FROM stats GROUP BY lang ORDER BY lang""".stripMargin,
    "q_gopher_repetition" ->
      s"""WITH tk AS (SELECT doc_id, lang, $ToksSql AS t FROM documents),
         |nn AS (SELECT doc_id, lang, t, len(t) AS nt FROM tk WHERE len(t) >= 1),
         |w AS (SELECT doc_id, lang, nt, ns.n AS n, gs.i AS pos,
         |        array_to_string(t[(gs.i+1):(gs.i+least(ns.n, nt))], ' ') AS s
         |      FROM nn,
         |        LATERAL (SELECT unnest([2, 3, 5]) AS n) ns,
         |        LATERAL (SELECT unnest(generate_series(0,
         |          CASE WHEN nt <= ns.n THEN 0 ELSE nt - ns.n END)) AS i) gs),
         |c AS (SELECT doc_id, lang, nt, n, s, count(*) AS c
         |      FROM w WHERE n IN (2, 3) GROUP BY 1, 2, 3, 4, 5),
         |tops AS (SELECT doc_id, lang, nt,
         |           coalesce(max(CASE WHEN n = 2
         |             THEN least(c * least(2, nt), nt) END), 0) AS top2,
         |           coalesce(max(CASE WHEN n = 3
         |             THEN least(c * least(3, nt), nt) END), 0) AS top3
         |         FROM c GROUP BY 1, 2, 3),
         |w5 AS (SELECT doc_id, nt, pos, least(pos + 5, nt) AS e,
         |         count(*) OVER (PARTITION BY doc_id, s) AS c
         |       FROM w WHERE n = 5),
         |mk AS (SELECT doc_id, nt, pos, e FROM w5 WHERE c > 1),
         |sw AS (SELECT doc_id, pos, e,
         |         max(e) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
         |       FROM mk),
         |g AS (SELECT doc_id, pos, e,
         |        sum(CASE WHEN pme IS NULL OR pos > pme THEN 1 ELSE 0 END)
         |          OVER (PARTITION BY doc_id ORDER BY pos
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |      FROM sw),
         |spans AS (SELECT doc_id, grp, min(pos) AS st, max(e) AS en
         |          FROM g GROUP BY 1, 2),
         |dup AS (SELECT doc_id, sum(en - st) AS d5 FROM spans GROUP BY 1),
         |sig AS (SELECT t.doc_id, t.lang, t.nt, t.top2, t.top3,
         |          coalesce(d.d5, 0) AS d5
         |        FROM tops t LEFT JOIN dup d ON t.doc_id = d.doc_id)
         |SELECT lang, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS sum_tokens,
         |       CAST(sum(top2) AS BIGINT) AS sum_top2_tokens,
         |       CAST(sum(top3) AS BIGINT) AS sum_top3_tokens,
         |       CAST(sum(d5) AS BIGINT) AS sum_dup5_tokens,
         |       CAST(sum(CASE WHEN top2 * 5 > nt THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_flagged_top2
         |FROM sig GROUP BY lang ORDER BY lang""".stripMargin,
    "q_bm25" ->
      s"""WITH ${bm25CtesSql(
           """q(qid, qtext) AS (VALUES (1, 'sort merge join'), (2, 'hash table scan'),
             |                         (3, 'stream window batch')),
             |qt AS (SELECT DISTINCT qid, unnest(string_split(qtext, ' ')) AS tok FROM q)""".stripMargin)},
         |rk AS (SELECT qid, doc_id, scaled_score,
         |         row_number() OVER (PARTITION BY qid
         |           ORDER BY scaled_score DESC, doc_id) AS rank
         |       FROM sc)
         |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
         |       doc_id, scaled_score
         |FROM rk WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,
    "q_ndcg" ->
      s"""WITH ${bm25CtesSql(
           """q(qid, qtext) AS (VALUES (1, 'sort merge join'), (2, 'hash table scan'),
             |                         (3, 'stream window batch')),
             |qt AS (SELECT DISTINCT qid, unnest(string_split(qtext, ' ')) AS tok FROM q)""".stripMargin)},
         |rk AS (SELECT qid, doc_id,
         |         row_number() OVER (PARTITION BY qid
         |           ORDER BY scaled_score DESC, doc_id) AS rank
         |       FROM sc QUALIFY rank <= 10),
         |dt AS (SELECT DISTINCT doc_id, unnest(t) AS tok FROM nn),
         |rel AS (SELECT qt.qid, dt.doc_id, CAST(count(*) AS BIGINT) AS rel
         |        FROM dt JOIN qt ON dt.tok = qt.tok GROUP BY 1, 2),
         |w(r, w) AS (VALUES (1, 1000000), (2, 630930), (3, 500000),
         |                   (4, 430677), (5, 386853), (6, 356207),
         |                   (7, 333333), (8, 315465), (9, 301030),
         |                   (10, 289065)),
         |dcg AS (SELECT rk.qid,
         |          CAST(sum(((1 << CAST(coalesce(rel.rel, 0) AS INT)) - 1) * w.w)
         |            AS BIGINT) AS dcg_u
         |        FROM rk
         |        LEFT JOIN rel ON rk.qid = rel.qid AND rk.doc_id = rel.doc_id
         |        JOIN w ON rk.rank = w.r
         |        GROUP BY 1),
         |gc AS (SELECT qid, rel AS g, count(*) AS cnt FROM rel GROUP BY 1, 2),
         |cc AS (SELECT qid, g,
         |         sum(cnt) OVER (PARTITION BY qid ORDER BY g DESC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |       FROM gc),
         |nrel AS (SELECT qid, CAST(max(cum) AS BIGINT) AS n_rel FROM cc GROUP BY 1),
         |ig AS (SELECT cc.qid, w.r, w.w, max(cc.g) AS ig
         |       FROM cc JOIN w ON cc.cum >= w.r GROUP BY 1, 2, 3),
         |idcg AS (SELECT qid,
         |           CAST(sum(((1 << CAST(ig AS INT)) - 1) * w) AS BIGINT) AS idcg_u
         |         FROM ig GROUP BY 1)
         |SELECT CAST(d.qid AS BIGINT) AS qid, coalesce(n.n_rel, 0) AS n_rel,
         |       d.dcg_u, coalesce(i.idcg_u, 0) AS idcg_u,
         |       CASE WHEN i.idcg_u > 0 THEN d.dcg_u * 1000000 // i.idcg_u END
         |         AS ndcg_ppm
         |FROM dcg d LEFT JOIN nrel n USING (qid) LEFT JOIN idcg i USING (qid)
         |ORDER BY qid""".stripMargin,
    "q_retrieval_recall" ->
      s"""WITH ${bm25CtesSql(
           """q(qid, qtext) AS (VALUES (1, 'sort merge join'), (2, 'hash table scan'),
             |                         (3, 'stream window batch')),
             |qt AS (SELECT DISTINCT qid, unnest(string_split(qtext, ' ')) AS tok FROM q)""".stripMargin)},
         |rk AS (SELECT qid, doc_id,
         |         row_number() OVER (PARTITION BY qid
         |           ORDER BY scaled_score DESC, doc_id) AS rank
         |       FROM sc QUALIFY rank <= 10),
         |dt AS (SELECT DISTINCT doc_id, unnest(t) AS tok FROM nn),
         |rb AS (SELECT qt.qid, dt.doc_id
         |       FROM dt JOIN qt ON dt.tok = qt.tok
         |       GROUP BY 1, 2 HAVING count(*) >= 2),
         |nr AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_rel FROM rb GROUP BY 1),
         |h AS (SELECT rk.qid,
         |        CAST(sum(CASE WHEN rb.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |          AS BIGINT) AS n_hits,
         |        min(CASE WHEN rb.doc_id IS NOT NULL THEN rk.rank END) AS fh
         |      FROM rk LEFT JOIN rb ON rk.qid = rb.qid AND rk.doc_id = rb.doc_id
         |      GROUP BY 1)
         |SELECT CAST(h.qid AS BIGINT) AS qid, coalesce(nr.n_rel, 0) AS n_rel,
         |       h.n_hits,
         |       CASE WHEN nr.n_rel > 0
         |            THEN h.n_hits * 1000000 // least(nr.n_rel, 10) END AS recall_ppm,
         |       CAST(coalesce(1000000 // fh, 0) AS BIGINT) AS rr_ppm
         |FROM h LEFT JOIN nr ON h.qid = nr.qid ORDER BY qid""".stripMargin,
    "q_hybrid_rrf" ->
      s"""WITH ${bm25CtesSql(
           "qt AS (SELECT DISTINCT doc_id AS qid, unnest(t) AS tok FROM nn WHERE doc_id < 10)")},
         |lexk AS (SELECT qid, doc_id AS id,
         |           row_number() OVER (PARTITION BY qid
         |             ORDER BY scaled_score DESC, doc_id) AS rank
         |         FROM sc QUALIFY rank <= 20),
         |semk AS (SELECT qid, id, rank FROM (
         |           SELECT q.vec_id AS qid, c.vec_id AS id,
         |             row_number() OVER (PARTITION BY q.vec_id
         |               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
         |                 CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
         |           FROM embeddings q JOIN embeddings c
         |             ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
         |         WHERE rank <= 20),
         |u AS (SELECT qid, id, 1000000000 // (60 + rank) AS c FROM lexk
         |      UNION ALL SELECT qid, id, 1000000000 // (60 + rank) AS c FROM semk),
         |f AS (SELECT qid, id, CAST(sum(c) AS BIGINT) AS scaled_rrf,
         |        count(*) AS n_runs FROM u GROUP BY 1, 2),
         |rk AS (SELECT qid, id, scaled_rrf, n_runs,
         |         row_number() OVER (PARTITION BY qid
         |           ORDER BY scaled_rrf DESC, id) AS rank
         |       FROM f)
         |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
         |       CAST(id AS BIGINT) AS id, scaled_rrf, CAST(n_runs AS BIGINT) AS n_runs
         |FROM rk WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,
    "q_decontaminate_fuzzy" ->
      s"""WITH tk AS (SELECT doc_id, $ToksSql AS t FROM documents),
         |ev AS (SELECT doc_id, t FROM tk WHERE doc_id < 20),
         |cp AS (SELECT doc_id + 1000000 AS doc_id, t[1:((len(t)*9+9)//10)] AS t FROM ev),
         |corpus AS (SELECT doc_id, t FROM tk UNION ALL SELECT doc_id, t FROM cp),
         |csh AS (
         |  SELECT doc_id AS cid, unnest(list_distinct(
         |    CASE WHEN len(t) <= 8 THEN [array_to_string(t, ' ')]
         |         ELSE list_transform(range(len(t)-7),
         |                i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
         |                     || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] || ' ' || t[i+8]) END)) AS s
         |  FROM corpus),
         |esh AS (
         |  SELECT doc_id AS eid, unnest(list_distinct(
         |    CASE WHEN len(t) <= 8 THEN [array_to_string(t, ' ')]
         |         ELSE list_transform(range(len(t)-7),
         |                i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
         |                     || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] || ' ' || t[i+8]) END)) AS s
         |  FROM ev),
         |sizes AS (SELECT eid, count(*) AS esize FROM esh GROUP BY eid),
         |ov AS (SELECT cid, eid, count(*) AS shared FROM csh JOIN esh
         |         ON csh.s = esh.s AND csh.cid <> esh.eid GROUP BY 1, 2),
         |cov AS (SELECT cid, shared * 1.0 / esize AS c
         |        FROM ov JOIN sizes USING (eid)
         |        WHERE shared * 1.0 / esize >= 0.5)
         |SELECT count(*) AS n_pairs, count(DISTINCT cid) AS n_docs_flagged,
         |       CAST(coalesce(sum(CAST(floor(c * 1e6 + 0.5) AS BIGINT)), 0) AS BIGINT) AS sum_scaled_cov
         |FROM cov""".stripMargin,
    "q_streaming_neardedup" ->
      s"""WITH tk AS (SELECT doc_id, lang, $ToksSql AS t FROM documents),
         |orig AS (SELECT doc_id, lang, t, doc_id % 3 AS b FROM tk),
         |cp AS (SELECT doc_id + 1000000 AS doc_id, lang,
         |              t[1:((len(t)*9+9)//10)] AS t, 3 AS b
         |       FROM tk WHERE doc_id % 10 = 0),
         |corpus AS (SELECT doc_id, lang, t, b FROM orig
         |           UNION ALL SELECT doc_id, lang, t, b FROM cp),
         |sh AS (SELECT doc_id, b, unnest(list_distinct(
         |         CASE WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
         |              ELSE list_transform(range(len(t)-2),
         |                     i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) END)) AS s
         |       FROM corpus),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |xp AS (SELECT a.doc_id AS x, a.b AS bx, h.doc_id AS y, count(*) AS i
         |       FROM sh a JOIN sh h ON a.s = h.s AND a.b > h.b
         |       GROUP BY 1, 2, 3),
         |dp AS (SELECT x, bx, y FROM xp
         |       JOIN cnt cx ON x = cx.doc_id JOIN cnt cy ON y = cy.doc_id
         |       WHERE i * 1.0 / (cx.n + cy.n - i) >= 0.8),
         |k0 AS (SELECT doc_id FROM corpus WHERE b = 0),
         |k1 AS (SELECT doc_id FROM corpus WHERE b = 1 AND doc_id NOT IN
         |        (SELECT x FROM dp WHERE bx = 1
         |         AND y IN (SELECT doc_id FROM k0))),
         |k2 AS (SELECT doc_id FROM corpus WHERE b = 2 AND doc_id NOT IN
         |        (SELECT x FROM dp WHERE bx = 2
         |         AND (y IN (SELECT doc_id FROM k0)
         |              OR y IN (SELECT doc_id FROM k1)))),
         |k3 AS (SELECT doc_id FROM corpus WHERE b = 3 AND doc_id NOT IN
         |        (SELECT x FROM dp WHERE bx = 3
         |         AND (y IN (SELECT doc_id FROM k0)
         |              OR y IN (SELECT doc_id FROM k1)
         |              OR y IN (SELECT doc_id FROM k2)))),
         |kept AS (SELECT doc_id FROM k0 UNION ALL SELECT doc_id FROM k1
         |         UNION ALL SELECT doc_id FROM k2 UNION ALL SELECT doc_id FROM k3)
         |SELECT c.lang, count(*) AS n_kept, CAST(sum(c.doc_id) AS BIGINT) AS id_sum
         |FROM kept JOIN corpus c USING (doc_id)
         |GROUP BY c.lang ORDER BY c.lang""".stripMargin,
    "q_cross_dedup" ->
      s"""WITH tk AS (SELECT doc_id, lang, $ToksSql AS t FROM documents),
         |hist AS (SELECT doc_id, t FROM tk WHERE doc_id % 3 = 0),
         |copies AS (SELECT doc_id + 1000000 AS doc_id, lang, t[1:((len(t)*9+9)//10)] AS t
         |           FROM tk WHERE doc_id % 15 = 0),
         |batch AS (SELECT doc_id, lang, t FROM tk WHERE doc_id % 3 <> 0
         |          UNION ALL SELECT doc_id, lang, t FROM copies),
         |shB AS (SELECT doc_id, unnest(list_distinct(
         |          CASE WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
         |               ELSE list_transform(range(len(t)-2),
         |                      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) END)) AS s
         |        FROM batch),
         |shH AS (SELECT doc_id, unnest(list_distinct(
         |          CASE WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
         |               ELSE list_transform(range(len(t)-2),
         |                      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) END)) AS s
         |        FROM hist),
         |cb AS (SELECT doc_id, count(*) AS n FROM shB GROUP BY 1),
         |ch AS (SELECT doc_id, count(*) AS n FROM shH GROUP BY 1),
         |inter AS (SELECT b.doc_id AS bid, h.doc_id AS hid, count(*) AS i
         |          FROM shB b JOIN shH h ON b.s = h.s GROUP BY 1, 2),
         |dropped AS (SELECT DISTINCT bid FROM inter
         |            JOIN cb ON bid = cb.doc_id JOIN ch ON hid = ch.doc_id
         |            WHERE i * 1.0 / (cb.n + ch.n - i) >= 0.8),
         |kept AS (SELECT b.doc_id, b.lang FROM batch b
         |         LEFT JOIN dropped d ON b.doc_id = d.bid WHERE d.bid IS NULL)
         |SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,
    "q_token_entropy" ->
      s"""WITH tok AS (SELECT doc_id, lang, unnest($ToksSql) AS t FROM documents),
         |c AS (SELECT doc_id, lang, t, count(*) AS c FROM tok GROUP BY 1, 2, 3),
         |d AS (SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS n,
         |        CAST(sum(c * CAST(floor(ln(c) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sc
         |      FROM c GROUP BY 1, 2),
         |h AS (SELECT lang, n,
         |        n * CAST(floor(ln(n) * 1e6 + 0.5) AS BIGINT) - sc AS num
         |      FROM d)
         |SELECT lang, count(*) AS n_docs, CAST(sum(num) AS BIGINT) AS sum_scaled_h_num,
         |       CAST(sum(n) AS BIGINT) AS sum_tokens,
         |       CAST(sum(CASE WHEN num < 3000000 * n THEN 1 ELSE 0 END) AS BIGINT) AS n_low_entropy
         |FROM h GROUP BY lang ORDER BY lang""".stripMargin,
    "q_paragraph_dedup" ->
      s"""WITH u AS (
         |  SELECT doc_id, lang, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2000000, lang, text FROM documents WHERE doc_id % 7 = 0),
         |tok AS (SELECT doc_id, lang, $ToksSql AS toks FROM u),
         |nn AS (SELECT doc_id, lang, toks, len(toks) AS n FROM tok WHERE len(toks) > 0),
         |ch AS (
         |  SELECT doc_id, lang, gs.i AS chunk_idx,
         |         toks[(gs.i*32+1):least(gs.i*32+32, n)] AS ctoks
         |  FROM nn, LATERAL (SELECT unnest(generate_series(0,
         |       CASE WHEN n <= 32 THEN 0 ELSE (n - 32 + 32 - 1)//32 END)) AS i) gs),
         |t2 AS (SELECT lang, doc_id * 1000000 + chunk_idx AS ik,
         |              array_to_string(ctoks, ' ') AS ct, len(ctoks) AS nt
         |       FROM ch),
         |first AS (SELECT ct, min(ik) AS fk FROM t2 GROUP BY ct),
         |k AS (SELECT t2.lang, t2.nt,
         |        CASE WHEN t2.ik = f.fk THEN 1 ELSE 0 END AS kept
         |      FROM t2 JOIN first f ON t2.ct = f.ct)
         |SELECT lang, count(*) AS n_chunks, CAST(sum(kept) AS BIGINT) AS n_kept,
         |       CAST(sum(CASE WHEN kept = 1 THEN nt ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
    "q_profile_approx" ->
      """SELECT 'doc_id' AS column_name, count(*) AS n_rows, count(doc_id) AS n_nonnull,
        |       count(DISTINCT doc_id) AS n_distinct_exact, true AS within_5pct
        |FROM documents
        |UNION ALL
        |SELECT 'lang', count(*), count(lang), count(DISTINCT lang), true FROM documents
        |UNION ALL
        |SELECT 'n_chars', count(*), count(n_chars), count(DISTINCT n_chars), true FROM documents
        |UNION ALL
        |SELECT 'source', count(*), count(source), count(DISTINCT source), true FROM documents
        |ORDER BY column_name""".stripMargin,
    "q_bigram_lm" ->
      s"""WITH tok AS (SELECT doc_id, lang, $ToksSql AS toks FROM documents),
         |nn AS (SELECT doc_id, lang, toks, len(toks) AS n FROM tok WHERE len(toks) >= 2),
         |bg AS (SELECT doc_id, lang, toks[gs.i+1] AS u,
         |              toks[gs.i+1] || ' ' || toks[gs.i+2] AS b
         |       FROM nn, LATERAL (SELECT unnest(generate_series(0, n - 2)) AS i) gs),
         |cu AS (SELECT u, count(*) AS c FROM bg GROUP BY u),
         |cb AS (SELECT b, count(*) AS c FROM bg GROUP BY b),
         |scored AS (SELECT doc_id, lang, count(*) AS m,
         |             sum(CAST(floor(ln(cb.c) * 1e6 + 0.5) AS BIGINT)
         |                 - CAST(floor(ln(cu.c) * 1e6 + 0.5) AS BIGINT)) AS lp
         |           FROM bg JOIN cu USING (u) JOIN cb USING (b) GROUP BY 1, 2)
         |SELECT lang, count(*) AS n_docs, CAST(sum(lp) AS BIGINT) AS sum_scaled_lp,
         |       CAST(sum(CASE WHEN lp > -3410000 * m THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM scored GROUP BY lang ORDER BY lang""".stripMargin,
    "q_profile" ->
      """SELECT 'doc_id' AS column_name, count(*) AS n_rows, count(doc_id) AS n_nonnull,
        |       count(DISTINCT doc_id) AS n_distinct,
        |       CAST(min(doc_id) AS VARCHAR) AS min_value, CAST(max(doc_id) AS VARCHAR) AS max_value
        |FROM documents
        |UNION ALL
        |SELECT 'lang', count(*), count(lang), count(DISTINCT lang),
        |       CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'n_chars', count(*), count(n_chars), count(DISTINCT n_chars),
        |       CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'source', count(*), count(source), count(DISTINCT source),
        |       CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR) FROM documents
        |ORDER BY column_name""".stripMargin,
    "q_domain_cap" ->
      """SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS kept_chars,
        |       CAST(min(doc_id) AS BIGINT) AS min_kept_id
        |FROM (SELECT source, n_chars, doc_id,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY n_chars DESC, doc_id ASC) AS rk
        |      FROM documents)
        |WHERE rk <= 5 GROUP BY source ORDER BY source""".stripMargin,
    "q_bfs_hops" ->
      """WITH RECURSIVE raw AS (
        |  SELECT 'site-' || CAST(doc_id % 20 AS VARCHAR) AS src,
        |         'site-' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst
        |  FROM documents WHERE doc_id % 20 < 17
        |  UNION ALL
        |  SELECT 'site-' || CAST(doc_id % 20 AS VARCHAR),
        |         'site-' || CAST((doc_id * 3 + 5) % 20 AS VARCHAR)
        |  FROM documents WHERE doc_id % 20 < 17 AND (doc_id % 20) % 3 = 0),
        |e AS (SELECT DISTINCT src, dst FROM raw),
        |bfs(node, hop) AS (
        |  SELECT * FROM (VALUES ('site-0', 0), ('site-1', 0)) t(node, hop)
        |  UNION ALL
        |  SELECT e.dst, bfs.hop + 1 FROM bfs JOIN e ON bfs.node = e.src
        |  WHERE bfs.hop < 4),
        |d AS (SELECT node, CAST(min(hop) AS BIGINT) AS hop FROM bfs GROUP BY 1)
        |SELECT hop, count(*) AS n_nodes, min(node) AS min_node
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_kcore" ->
      """WITH raw AS (
        |  SELECT 'site-' || CAST(doc_id % 20 AS VARCHAR) AS src,
        |         'site-' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst
        |  FROM documents WHERE doc_id % 20 < 17
        |  UNION ALL
        |  SELECT 'site-' || CAST(doc_id % 20 AS VARCHAR),
        |         'site-' || CAST((doc_id * 3 + 5) % 20 AS VARCHAR)
        |  FROM documents WHERE doc_id % 20 < 17 AND (doc_id % 20) % 3 = 0),
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |  FROM raw WHERE src <> dst),
        |a0 AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
        |k1 AS (SELECT u FROM a0 GROUP BY u HAVING count(*) >= 2),
        |a1 AS (SELECT a.u, a.v FROM a0 a JOIN k1 x ON a.u = x.u
        |       JOIN k1 y ON a.v = y.u),
        |k2 AS (SELECT u FROM a1 GROUP BY u HAVING count(*) >= 2),
        |a2 AS (SELECT a.u, a.v FROM a1 a JOIN k2 x ON a.u = x.u
        |       JOIN k2 y ON a.v = y.u),
        |k3 AS (SELECT u FROM a2 GROUP BY u HAVING count(*) >= 2),
        |a3 AS (SELECT a.u, a.v FROM a2 a JOIN k3 x ON a.u = x.u
        |       JOIN k3 y ON a.v = y.u),
        |core AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS degree
        |         FROM a3 GROUP BY 1)
        |SELECT count(*) AS n_core_nodes,
        |       CAST(coalesce(sum(degree), 0) AS BIGINT) AS sum_core_degree,
        |       min(node) AS min_node
        |FROM core""".stripMargin,
    "q_label_prop" ->
      """WITH raw AS (
        |  SELECT 'site-' || CAST(doc_id % 20 AS VARCHAR) AS src,
        |         'site-' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst
        |  FROM documents WHERE doc_id % 20 < 17
        |  UNION ALL
        |  SELECT 'site-' || CAST(doc_id % 20 AS VARCHAR),
        |         'site-' || CAST((doc_id * 3 + 5) % 20 AS VARCHAR)
        |  FROM documents WHERE doc_id % 20 < 17 AND (doc_id % 20) % 3 = 0),
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |  FROM raw WHERE src <> dst),
        |adj AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
        |l0 AS (SELECT DISTINCT u AS node, u AS label FROM adj),
        |c1 AS (SELECT a.u AS node, p.label, count(*) AS n
        |       FROM adj a JOIN l0 p ON a.v = p.node GROUP BY 1, 2),
        |l1 AS (SELECT node, label FROM (
        |         SELECT node, label,
        |                row_number() OVER (PARTITION BY node ORDER BY n DESC, label) AS rk
        |         FROM c1) WHERE rk = 1),
        |c2 AS (SELECT a.u AS node, p.label, count(*) AS n
        |       FROM adj a JOIN l1 p ON a.v = p.node GROUP BY 1, 2),
        |l2 AS (SELECT node, label FROM (
        |         SELECT node, label,
        |                row_number() OVER (PARTITION BY node ORDER BY n DESC, label) AS rk
        |         FROM c2) WHERE rk = 1),
        |c3 AS (SELECT a.u AS node, p.label, count(*) AS n
        |       FROM adj a JOIN l2 p ON a.v = p.node GROUP BY 1, 2),
        |l3 AS (SELECT node, label FROM (
        |         SELECT node, label,
        |                row_number() OVER (PARTITION BY node ORDER BY n DESC, label) AS rk
        |         FROM c3) WHERE rk = 1)
        |SELECT label, count(*) AS n_nodes, min(node) AS min_node
        |FROM l3 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_triangles" ->
      """WITH raw AS (
        |  SELECT 'site-' || CAST(doc_id % 20 AS VARCHAR) AS src,
        |         'site-' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst
        |  FROM documents WHERE doc_id % 20 < 17
        |  UNION ALL
        |  SELECT 'site-' || CAST(doc_id % 20 AS VARCHAR),
        |         'site-' || CAST((doc_id * 3 + 5) % 20 AS VARCHAR)
        |  FROM documents WHERE doc_id % 20 < 17 AND (doc_id % 20) % 3 = 0),
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |  FROM raw WHERE src <> dst),
        |deg AS (
        |  SELECT x, count(*) AS d FROM (
        |    SELECT u AS x FROM und UNION ALL SELECT v AS x FROM und) GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
        |              THEN e.u ELSE e.v END AS a,
        |         CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
        |              THEN e.v ELSE e.u END AS b
        |  FROM und e JOIN deg du ON e.u = du.x JOIN deg dv ON e.v = dv.x),
        |w AS (SELECT CAST(coalesce(sum(od * (od - 1) // 2), 0) AS BIGINT) AS n_wedges
        |      FROM (SELECT a, count(*) AS od FROM o GROUP BY 1)),
        |tri AS (SELECT count(*) AS n_triangles
        |        FROM und e1 JOIN und e2 ON e2.u = e1.v
        |                    JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |       (SELECT count(*) FROM und) AS n_edges,
        |       (SELECT n_wedges FROM w) AS n_wedges,
        |       (SELECT n_triangles FROM tri) AS n_triangles""".stripMargin,
    "q_pagerank" -> pagerankOracleSql(3, seedPred = None),
    "q_trustrank" -> pagerankOracleSql(3, seedPred = Some(
      "node IN ('site-0','site-1','site-2','site-3','site-4')")),
    "q_upsample" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |         CASE CAST(substr(source, 4) AS BIGINT) % 4
        |           WHEN 0 THEN 25000 WHEN 1 THEN 10000
        |           WHEN 2 THEN 4000 ELSE 0 END AS bp,
        |         ((doc_id + 11) % 2147483647 * 48271) % 2147483647 % 10000 AS bkt
        |  FROM documents),
        |c AS (SELECT doc_id, source,
        |             bp // 10000
        |               + CASE WHEN bkt < bp % 10000 THEN 1 ELSE 0 END AS copies
        |      FROM r),
        |x AS (SELECT doc_id, source,
        |             unnest(generate_series(0, copies - 1)) AS copy_idx
        |      FROM c)
        |SELECT source, count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs,
        |       CAST(sum(doc_id * (copy_idx + 1)) AS BIGINT) AS copy_checksum
        |FROM x GROUP BY source ORDER BY source""".stripMargin,
    "q_shard_assign" ->
      """WITH r AS (
        |  SELECT doc_id, md5('sh1:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, shuffle_key,
        |         ((row_number() OVER (ORDER BY shuffle_key) - 1) * 8)
        |           // (SELECT count(*) FROM r) AS shard
        |  FROM r)
        |SELECT shard, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |       min(shuffle_key) AS min_key, max(shuffle_key) AS max_key
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin)

  /** Unrolls the [[graft.ops.PageRank]] integer recurrence to `iters`
    * chained CTEs — same edges, same floor divisions, same damping, so
    * the comparison is bit-exact, not an epsilon check. `seedPred`
    * (a SQL predicate over `node`) switches to the personalized restart
    * vector: base mass on seeds only, dangling mass back to seeds only.
    */
  private def pagerankOracleSql(iters: Int, seedPred: Option[String]): String = {
    val pred = seedPred.getOrElse("TRUE")
    val head =
      s"""WITH e AS (
         |  SELECT DISTINCT printf('site-%d', doc_id % 20) AS src,
         |         printf('site-%d', (doc_id * 7 + 3) % 20) AS dst
         |  FROM documents WHERE doc_id % 20 < 17
         |  UNION
         |  SELECT DISTINCT printf('site-%d', doc_id % 20),
         |         printf('site-%d', (doc_id * 3 + 5) % 20)
         |  FROM documents WHERE doc_id % 20 < 17 AND (doc_id % 20) % 3 = 0),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |deg AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY src),
         |p AS (SELECT count(*) AS sc,
         |             1000000000000 // count(*) AS sbase
         |      FROM nodes WHERE $pred),
         |r0 AS (SELECT node, coalesce(outdeg, 0) AS outdeg, $pred AS is_seed,
         |              CASE WHEN $pred THEN (SELECT sbase FROM p) ELSE 0 END AS base,
         |              CASE WHEN $pred THEN (SELECT sbase FROM p) ELSE 0 END AS rank
         |       FROM nodes LEFT JOIN deg USING (node))""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""d$k AS (SELECT coalesce(sum(rank), 0) // (SELECT sc FROM p) AS ds
         |       FROM r${k - 1} WHERE outdeg = 0),
         |c$k AS (SELECT e.dst AS node, sum(r.rank // r.outdeg) AS contrib
         |       FROM e JOIN r${k - 1} r ON e.src = r.node GROUP BY e.dst),
         |r$k AS (SELECT r.node, r.outdeg, r.is_seed, r.base,
         |              (15 * r.base
         |               + 85 * (coalesce(c.contrib, 0)
         |                       + CASE WHEN r.is_seed THEN (SELECT ds FROM d$k)
         |                              ELSE 0 END))
         |              // 100 AS rank
         |       FROM r${k - 1} r LEFT JOIN c$k c USING (node))""".stripMargin
    }
    // CAST: sum() over BIGINT is HUGEINT in DuckDB, which the driver's
    // pandas fetch widens to float64 — hash-mismatching Spark's exact
    // longs even when every value is identical.
    val outCols =
      if (seedPred.isDefined)
        "node, outdeg, is_seed, CAST(rank AS BIGINT) AS rank_scaled"
      else "node, outdeg, CAST(rank AS BIGINT) AS rank_scaled"
    (head +: steps).mkString(",\n") +
      s"\nSELECT $outCols FROM r$iters ORDER BY node"
  }
}
