package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.log.{LogOptions, PartitionValues}

/** Hive-style partition columns on the `log` source ([[PartitionValues]]):
  * explicit `partitionSchema`, typed values from `name=value` path
  * segments, and — the scale point — claimed partition filters pruning
  * whole FILES at plan time. Pruning is proven the strong way: a file in
  * the pruned-out partition contains lines that would kill the query in
  * FAILFAST mode; the query succeeding at all means that file was never
  * opened.
  */
class LogPartitionSpec extends SparkSpec {

  private def writeTree(entries: (String, Seq[String])*): File = {
    val root = Files.createTempDirectory("logpart").toFile
    entries.foreach { case (rel, lines) =>
      val f = new File(root, rel)
      f.getParentFile.mkdirs()
      Files.writeString(f.toPath, lines.mkString("\n"))
    }
    root
  }

  private def readLog(root: File, extra: (String, String)*) = {
    val base = spark.read.format("log")
      .option("pattern", "(\\d+) (\\w+)")
      .option("schema", "id INT, level VARCHAR")
      .option("extensions", "log")
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
      .load(root.getAbsolutePath)
  }

  test("partition columns land typed, after unmatched_lines, constant per file") {
    val root = writeTree(
      "dt=2024-03-01/host=web1/a.log" -> Seq("1 INFO", "2 WARN"),
      "dt=2024-03-02/host=web2/b.log" -> Seq("3 ERROR"))
    val df = readLog(root, "partitionSchema" -> "dt DATE, host STRING")
    assert(df.schema.fieldNames.toSeq ==
      Seq("id", "level", "unmatched_lines", "dt", "host"))
    assert(df.schema("dt").dataType == org.apache.spark.sql.types.DateType)
    val rows = df.select("id", "dt", "host").collect()
      .map(r => (r.getInt(0), r.getDate(1).toString, r.getString(2))).sorted
    assert(rows.toSeq == Seq(
      (1, "2024-03-01", "web1"), (2, "2024-03-01", "web1"), (3, "2024-03-02", "web2")))
  }

  test("partition filter prunes files: poisoned partition never opened") {
    val root = writeTree(
      "dt=2024-03-01/a.log" -> Seq("1 INFO", "2 WARN"),
      // FAILFAST would die on this line — the proof it is never read
      "dt=2024-03-02/b.log" -> Seq("not matching at all"))
    val df = readLog(root,
      "partitionSchema" -> "dt DATE", "mode" -> "FAILFAST")
      .filter(col("dt") === lit(java.sql.Date.valueOf("2024-03-01")))
    assert(df.select(sum("id")).collect().head.getLong(0) == 3L)
    // and the claim is visible in the scan description
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("partitionFilters="), scanDesc)
  }

  test("range + Or/Not partition filters prune correctly (typed DATE, INT)") {
    val root = writeTree(
      "dt=2024-03-01/shard=1/a.log" -> Seq("1 A"),
      "dt=2024-03-02/shard=2/b.log" -> Seq("2 B"),
      "dt=2024-03-03/shard=3/c.log" -> Seq("3 C"),
      "dt=2024-03-04/shard=4/d.log" -> Seq("4 D"))
    val df = readLog(root, "partitionSchema" -> "dt DATE, shard INT")
    def ids(f: org.apache.spark.sql.Column): Seq[Int] =
      df.filter(f).select("id").collect().map(_.getInt(0)).sorted.toSeq
    assert(ids(col("dt") >= lit(java.sql.Date.valueOf("2024-03-03"))) == Seq(3, 4))
    assert(ids(col("shard") === 2 || col("shard") === 4) == Seq(2, 4))
    assert(ids(!(col("shard") < 3)) == Seq(3, 4))
    assert(ids(col("shard").isin(1, 3)) == Seq(1, 3))
  }

  test("estimateStatistics reflects pruned bytes exactly") {
    val big = Seq.tabulate(500)(i => s"$i INFO")
    val root = writeTree(
      "dt=2024-03-01/a.log" -> Seq("1 INFO"),
      "dt=2024-03-02/b.log" -> big)
    val all = readLog(root, "partitionSchema" -> "dt DATE")
    val one = all.filter(col("dt") === lit(java.sql.Date.valueOf("2024-03-01")))
    val allSize = all.queryExecution.optimizedPlan.stats.sizeInBytes
    val oneSize = one.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(oneSize * 10 < allSize, s"one=$oneSize all=$allSize")
  }

  test("null partition (__HIVE_DEFAULT_PARTITION__) and IsNull/IsNotNull") {
    val root = writeTree(
      "dt=2024-03-01/a.log" -> Seq("1 A"),
      "dt=__HIVE_DEFAULT_PARTITION__/b.log" -> Seq("2 B"))
    val df = readLog(root, "partitionSchema" -> "dt DATE")
    assert(df.filter(col("dt").isNull).select("id").collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(df.filter(col("dt").isNotNull).select("id").collect().map(_.getInt(0)).toSeq == Seq(1))
    // 3VL: an equality filter must NOT resurrect the null partition
    assert(df.filter(col("dt") =!= lit(java.sql.Date.valueOf("2024-03-01")))
      .count() == 0L)
  }

  test("escaped segment values decode (hive %-escaping)") {
    val root = writeTree("tag=a%3Db/a.log" -> Seq("1 A")) // a=b
    val df = readLog(root, "partitionSchema" -> "tag STRING")
    assert(df.select("tag").collect().map(_.getString(0)).toSeq == Seq("a=b"))
    assert(df.filter(col("tag") === "a=b").count() == 1L)
  }

  test("config validation: collisions, bad types, duplicate names") {
    intercept[IllegalArgumentException] {
      LogOptions.fromMap(Map(
        "pattern" -> "(\\d+) (\\w+)", "schema" -> "id INT, level VARCHAR",
        "partitionschema" -> "level STRING"))
    }
    intercept[IllegalArgumentException] {
      LogOptions.fromMap(Map(
        "pattern" -> "(\\d+)", "schema" -> "id INT",
        "partitionschema" -> "dt TIMESTAMP")) // unsupported partition type
    }
    intercept[IllegalArgumentException] {
      LogOptions.fromMap(Map(
        "pattern" -> "(\\d+)", "schema" -> "id INT",
        "partitionschema" -> "dt DATE, DT DATE"))
    }
  }

  test("missing or malformed segment fails at plan time with the path named") {
    val root = writeTree("nodate/a.log" -> Seq("1 A"))
    val e = intercept[Exception] {
      readLog(root, "partitionSchema" -> "dt DATE").count()
    }
    assert(e.getMessage.contains("dt"), e.getMessage)
    val root2 = writeTree("dt=not-a-date/a.log" -> Seq("1 A"))
    val e2 = intercept[Exception] {
      readLog(root2, "partitionSchema" -> "dt DATE").count()
    }
    assert(e2.getMessage.contains("not-a-date"), e2.getMessage)
  }

  test("mixed pushdown: partition filter prunes files, data filter prunes rows") {
    val root = writeTree(
      "dt=2024-03-01/a.log" -> Seq("1 INFO", "2 WARN", "3 INFO"),
      "dt=2024-03-02/b.log" -> Seq("4 INFO"))
    val df = readLog(root, "partitionSchema" -> "dt DATE")
      .filter(col("dt") === lit(java.sql.Date.valueOf("2024-03-01")) &&
        col("level") === "INFO")
    assert(df.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("partitionFilters=[") && desc.contains("EqualTo(dt,2024-03-01)"), desc)
    assert(desc.contains("EqualTo(level,INFO)"), desc)
  }

  test("count(*) over a partition-pruned scan") {
    val root = writeTree(
      "dt=2024-03-01/a.log" -> Seq("1 A", "2 B"),
      "dt=2024-03-02/b.log" -> Seq("3 C"))
    val df = readLog(root, "partitionSchema" -> "dt DATE")
      .filter(col("dt") === lit(java.sql.Date.valueOf("2024-03-02")))
    assert(df.count() == 1L)
  }

  test("streaming: partition values present, pruned files never admitted") {
    val root = writeTree(
      "dt=2024-03-01/a.log" -> Seq("1 INFO"),
      // poison: would fail the pattern into unmatched_lines and flunk the
      // assertion below if admitted
      "dt=2024-03-02/b.log" -> Seq("garbage that does not match"))
    val stream = spark.readStream.format("log")
      .option("pattern", "(\\d+) (\\w+)")
      .option("schema", "id INT, level VARCHAR")
      .option("extensions", "log")
      .option("partitionSchema", "dt DATE")
      .load(root.getAbsolutePath)
      .filter(col("dt") === lit(java.sql.Date.valueOf("2024-03-01")))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("logpart_stream")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val rows = spark.table("logpart_stream")
      .select("id", "dt").collect()
      .map(r => (r.getInt(0), r.getDate(1).toString)).toSeq
    assert(rows == Seq((1, "2024-03-01")))
  }

  test("runtime (join-driven) pruning: dimension filter skips files at execution") {
    val root = writeTree(
      "shard=1/a.log" -> Seq("1 INFO", "2 WARN"),
      "shard=2/b.log" -> Seq("3 INFO"),
      // FAILFAST poison: only a runtime filter derived from the dimension
      // can prune this — no static predicate mentions shard
      "shard=3/c.log" -> Seq("completely unparseable"))
    val fact = readLog(root, "partitionSchema" -> "shard INT", "mode" -> "FAILFAST")
    import spark.implicits._
    // parquet-backed dim: a LocalRelation's filter constant-folds away and
    // the DPP rule then sees no selective build-side predicate
    val dimPath = Files.createTempDirectory("logpart_dim").toString
    Seq((1, 1), (2, 1), (3, 0)).toDF("shard", "keep")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    // broadcast hint pins the 100-TB shape: the dim is the build side, so
    // the DPP subquery reuses its broadcast. (Without it, this tiny test
    // fact broadcasts instead — our size stats at work — and AQE degrades
    // the pruning expression to `true`.)
    val joined = fact.join(broadcast(dim.filter(col("keep") === 1)), "shard")
    val rows = joined.select("id").collect().map(_.getInt(0)).sorted.toSeq
    assert(rows == Seq(1, 2, 3))
    // the executed plan carries a LIVE dynamic pruning subquery on the scan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression(shard"), plan)
    assert(!plan.contains("dynamicpruningexpression(true)"), plan)
  }

  test("dirColumns: positional Drill-style directory values, null below depth") {
    val root = writeTree(
      "2024/03/01/a.log" -> Seq("1 INFO"),
      "2024/03/b.log" -> Seq("2 WARN"), // one level shallow: day is NULL
      "c.log" -> Seq("3 ERROR")) // at the root: all NULL
    val df = readLog(root, "dirColumns" -> "year, month, day")
    assert(df.schema.fieldNames.toSeq ==
      Seq("id", "level", "unmatched_lines", "year", "month", "day"))
    val rows = df.select("id", "year", "month", "day").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1, "2024", "03", "01"), (2, "2024", "03", null), (3, null, null, null)))
  }

  test("dirColumns prune files: poisoned year directory never opened") {
    val root = writeTree(
      "2024/03/a.log" -> Seq("1 INFO"),
      "2023/12/b.log" -> Seq("unparseable poison"))
    val df = readLog(root, "dirColumns" -> "year, month", "mode" -> "FAILFAST")
      .filter(col("year") === "2024")
    assert(df.select(sum("id")).collect().head.getLong(0) == 1L)
    // and null-depth 3VL: IsNull matches only the shallow file
    val root2 = writeTree(
      "2024/a.log" -> Seq("5 A"),
      "top.log" -> Seq("6 B"))
    val df2 = readLog(root2, "dirColumns" -> "year")
    assert(df2.filter(col("year").isNull).select("id")
      .collect().map(_.getInt(0)).toSeq == Seq(6))
  }

  test("dirColumns compose with partitionSchema; streaming prunes on them") {
    val root = writeTree(
      "2024/dt=2024-03-01/a.log" -> Seq("1 INFO"),
      "2023/dt=2023-12-31/b.log" -> Seq("garbage poison"))
    val stream = spark.readStream.format("log")
      .option("pattern", "(\\d+) (\\w+)")
      .option("schema", "id INT, level VARCHAR")
      .option("extensions", "log")
      .option("partitionSchema", "dt DATE")
      .option("dirColumns", "year")
      .load(root.getAbsolutePath)
      .filter(col("year") === "2024")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("logdir_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val rows = spark.table("logdir_stream")
      .select("id", "dt", "year").collect()
      .map(r => (r.getInt(0), r.getDate(1).toString, r.getString(2))).toSeq
    assert(rows == Seq((1, "2024-03-01", "2024")))
  }

  test("implicitColumns: Drill's fqn/filepath/filename/suffix per file") {
    val root = writeTree("sub/app.log" -> Seq("1 INFO"))
    val df = readLog(root, "implicitColumns" -> "fqn, filepath, filename, suffix")
    assert(df.schema.fieldNames.toSeq ==
      Seq("id", "level", "unmatched_lines", "fqn", "filepath", "filename", "suffix"))
    val r = df.select("fqn", "filepath", "filename", "suffix").collect().head
    assert(r.getString(2) == "app.log")
    assert(r.getString(3) == "log")
    assert(r.getString(0).endsWith("/sub/app.log"), r.getString(0))
    assert(r.getString(1).endsWith("/sub"), r.getString(1))
    // unknown implicit name is a plan-time config error
    intercept[IllegalArgumentException] {
      LogOptions.fromMap(Map("pattern" -> "(\\d+)", "schema" -> "id INT",
        "implicitcolumns" -> "filename, basename"))
    }
  }

  test("implicit-column filters prune files: poisoned suffix never opened") {
    val root = writeTree(
      "a.log" -> Seq("1 INFO"),
      "b.txt" -> Seq("total garbage")) // FAILFAST poison, selected away by suffix
    val df = readLog(root,
      "implicitColumns" -> "suffix", "extensions" -> "log,txt", "mode" -> "FAILFAST")
      .filter(col("suffix") === "log")
    assert(df.select(sum("id")).collect().head.getLong(0) == 1L)
  }

  test("scale probe: 1000-partition tree, 999 poisoned partitions all pruned") {
    val root = Files.createTempDirectory("logpart_scale").toFile
    for (i <- 0 until 1000) {
      val d = new File(root, f"shard=$i%04d")
      d.mkdirs()
      Files.writeString(new File(d, "a.log").toPath,
        if (i == 437) "1 INFO\n2 WARN" else "poison that cannot parse")
    }
    val t0 = System.nanoTime()
    val df = readLog(root, "partitionSchema" -> "shard STRING", "mode" -> "FAILFAST")
      .filter(col("shard") === "0437")
    assert(df.select(sum("id")).collect().head.getLong(0) == 3L)
    val dt = (System.nanoTime() - t0) / 1e9
    // listing 1000 dirs + pruning 999 files must stay a sub-second
    // driver-side operation (generous bound: CI boxes vary)
    assert(dt < 30.0, s"planning+scan took ${dt}s over a 1000-partition tree")
  }

  test("multiline records carry partition constants like single-line rows") {
    val root = writeTree(
      "dt=2024-03-01/a.log" -> Seq("1 START alpha", "  cont one", "2 START beta", "  cont two"))
    val df = spark.read.format("log")
      .option("pattern", "(\\d+) START (\\w+)")
      .option("schema", "id INT, name VARCHAR")
      .option("recordStartPattern", "^\\d+ START")
      .option("partitionSchema", "dt DATE")
      .option("extensions", "log")
      .load(root.getAbsolutePath)
    val rows = df.select("id", "name", "dt").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDate(2).toString)).sortBy(_._1)
    assert(rows.toSeq == Seq((1, "alpha", "2024-03-01"), (2, "beta", "2024-03-01")))
  }

  test("implicitColumns flow through streaming reads too") {
    val root = writeTree("sub/a.log" -> Seq("1 INFO"))
    val stream = spark.readStream.format("log")
      .option("pattern", "(\\d+) (\\w+)")
      .option("schema", "id INT, level VARCHAR")
      .option("extensions", "log")
      .option("implicitColumns", "filename, suffix")
      .load(root.getAbsolutePath)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("logimpl_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val r = spark.table("logimpl_stream").select("id", "filename", "suffix").collect().head
    assert((r.getInt(0), r.getString(1), r.getString(2)) == ((1, "a.log", "log")))
  }

  test("spark.table over a log path resolves via the hint rule") {
    val root = writeTree("dt=2024-03-01/a.log" -> Seq("1 INFO"))
    // DataFrameReader.table doesn't pass through the SQL parser, so this
    // exercises the analyzer-side (hint batch) half of LogPathRelation;
    // default options -> single `line` column
    val df = spark.table(s"log.`${root.getAbsolutePath}`")
    assert(df.schema.fieldNames.toSeq == Seq("line", "unmatched_lines"))
    assert(df.select("line").collect().map(_.getString(0)).toSeq == Seq("1 INFO"))
  }

  test("k=v matching is scoped: file names and ancestors of the root don't participate") {
    // a file legitimately NAMED like a partition segment is data, not a
    // partition value — before r12 this raised a conflicting-values error
    val root = writeTree(
      "dt=2024-03-01/dt=2024-03-02.log" -> Seq("1 INFO"))
    val df = readLog(root, "partitionSchema" -> "dt DATE")
    assert(df.select("id", "dt").collect()
      .map(r => (r.getInt(0), r.getDate(1).toString)).toSeq ==
      Seq((1, "2024-03-01")))
    // ancestors ABOVE the load root don't participate either: a tree
    // rooted inside an exp=9 directory reads its own exp= levels fine
    val outer = writeTree(
      "exp=9/logs/exp=1/a.log" -> Seq("1 A"),
      "exp=9/logs/exp=2/b.log" -> Seq("2 B"))
    val inner = new File(outer, "exp=9/logs")
    val df2 = readLog(inner, "partitionSchema" -> "exp INT")
    assert(df2.select("id", "exp").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq ==
      Seq((1, 1), (2, 2)))
  }

  test("loading a partition directory directly: root's own k=v segments fill in") {
    // shared table options pointed at ONE partition — the r12 scoping made
    // this fail planning with "no 'dt=' segment"; the root's trailing k=v
    // run participates as a FALLBACK (Spark basePath-style)
    val root = writeTree(
      "dt=2024-03-01/a.log" -> Seq("1 INFO"),
      "dt=2024-03-02/b.log" -> Seq("2 WARN"))
    val df = readLog(new File(root, "dt=2024-03-01"), "partitionSchema" -> "dt DATE")
    assert(df.select("id", "dt").collect()
      .map(r => (r.getInt(0), r.getDate(1).toString)).toSeq == Seq((1, "2024-03-01")))
    // multi-level: .load(".../dt=X/host=Y") fills both declared keys
    val root2 = writeTree("dt=2024-03-05/host=web1/a.log" -> Seq("7 INFO"))
    val df2 = readLog(new File(root2, "dt=2024-03-05/host=web1"),
      "partitionSchema" -> "dt DATE, host STRING")
    assert(df2.select("id", "dt", "host").collect()
      .map(r => (r.getInt(0), r.getDate(1).toString, r.getString(2))).toSeq ==
      Seq((7, "2024-03-05", "web1")))
    // a below-root segment still WINS over the root's own (scoping intact)
    val root3 = writeTree("dt=2024-03-01/dt=2024-03-09/a.log" -> Seq("3 X"))
    val df3 = readLog(new File(root3, "dt=2024-03-01"), "partitionSchema" -> "dt DATE")
    assert(df3.select("id", "dt").collect()
      .map(r => (r.getInt(0), r.getDate(1).toString)).toSeq == Seq((3, "2024-03-09")))
  }

  test("streaming: hive values scoped below the root too (k=v ancestor above root)") {
    // the batch fix alone is not enough — the streaming chunk planner
    // must thread roots whenever partitionSchema is declared, or the
    // ancestor exp=9 conflicts with the tree's own exp= levels at
    // planInputPartitions time
    val outer = writeTree(
      "exp=9/logs/exp=1/a.log" -> Seq("1 A"),
      "exp=9/logs/exp=2/b.log" -> Seq("2 B"))
    val inner = new File(outer, "exp=9/logs")
    val stream = spark.readStream.format("log")
      .option("pattern", "(\\d+) (\\w+)")
      .option("schema", "id INT, level VARCHAR")
      .option("extensions", "log")
      .option("partitionSchema", "exp INT")
      .load(inner.getAbsolutePath)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("loghive_stream")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val rows = spark.table("loghive_stream").select("id", "exp").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(rows == Seq((1, 1), (2, 2)))
  }

  test("runtime (join-driven) pruning works on dirColumns too") {
    val root = writeTree(
      "1/a.log" -> Seq("1 INFO", "2 WARN"),
      "2/b.log" -> Seq("3 INFO"),
      // FAILFAST poison: only the dimension-derived runtime filter on the
      // positional dir column can prune this
      "3/c.log" -> Seq("completely unparseable"))
    val fact = readLog(root, "dirColumns" -> "shard", "mode" -> "FAILFAST")
    import spark.implicits._
    val dimPath = Files.createTempDirectory("logdir_dim").toString
    Seq(("1", 1), ("2", 1), ("3", 0)).toDF("shard", "keep")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(broadcast(dim.filter(col("keep") === 1)), "shard")
    assert(joined.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression(shard"), plan)
    assert(!plan.contains("dynamicpruningexpression(true)"), plan)
  }

  test("unescapePathName: hex pairs, malformed '%' literal") {
    assert(PartitionValues.unescapePathName("a%3Db%2Fc") == "a=b/c")
    assert(PartitionValues.unescapePathName("100%") == "100%")
    assert(PartitionValues.unescapePathName("%zz") == "%zz")
    assert(PartitionValues.unescapePathName("plain") == "plain")
  }

  test("unescapePathName round-trips Spark's escapePathName on fuzzed values") {
    // Spark's ExternalCatalogUtils.escapePathName writes the segments this
    // source reads back; a locally-implemented identical escape (the hive
    // charset: control chars + the reserved punctuation, %-hex, uppercase)
    // pins the inverse on 300 adversarial values
    import org.scalacheck.{Gen, Prop}
    def needsEscape(c: Char): Boolean =
      c < ' ' || "\"#%'*/:=?\\{[]^".contains(c)
    def escape(s: String): String =
      s.flatMap(c => if (needsEscape(c)) f"%%${c.toInt}%02X" else c.toString)
    val genValue: Gen[String] = for {
      n <- Gen.choose(0, 16)
      cs <- Gen.listOfN(n, Gen.oneOf(
        Gen.alphaNumChar, Gen.oneOf("%=/\\:#?*'\"{[]}^ \t\n-._".toSeq)))
    } yield cs.mkString
    val prop = Prop.forAllNoShrink(genValue) { v =>
      PartitionValues.unescapePathName(escape(v)) == v
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(300)
      .withInitialSeed(org.scalacheck.rng.Seed(20260815L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
    // end-to-end: an escaped '=' inside a partition VALUE reads back
    val root = writeTree("k=a%3Db/a.log" -> Seq("1 INFO"))
    val df = readLog(root, "partitionSchema" -> "k STRING")
    assert(df.select("k").collect().map(_.getString(0)).toSeq == Seq("a=b"))
  }
}
