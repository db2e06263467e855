package graft

import org.apache.spark.sql.functions._

import graft.ops.PartitionedSink

class PartitionedSinkSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_psink").resolve("out").toString

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("round-trip: partitioned write preserves every row") {
    val out = freshDir()
    PartitionedSink.writePartitioned(docs, out, Seq("lang"), Seq("doc_id"))
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      docs.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("layout: one directory per partition value, bounded files per partition") {
    val out = freshDir()
    PartitionedSink.writePartitioned(docs, out, Seq("lang"), Seq("doc_id"), filesPerPartition = 3)
    val langDirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("lang="))
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langDirs.map(_.getName.stripPrefix("lang=")).toSet == langs)
    for (d <- langDirs) {
      val parts = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(parts >= 1 && parts <= 3, s"${d.getName}: $parts files")
    }
  }

  test("upsertByKey: replace by key, carry the rest, never rewrite untouched partitions") {
    import spark.implicits._
    val out = freshDir()
    val base = Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30), (4L, "c", 40))
      .toDF("id", "part", "v")
    PartitionedSink.writePartitioned(base, out, Seq("part"), Seq("id"))
    def cFiles() = new java.io.File(s"$out/part=c").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet
    val before = cFiles()
    // replace id 2 in partition a, insert id 5 into partition b; c untouched
    val batch = Seq((2L, "a", 99), (5L, "b", 50)).toDF("id", "part", "v")
    PartitionedSink.upsertByKey(batch, out, "part", "id")
    val got = spark.read.parquet(out).select("id", "v", "part")
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 10, "a"), (2L, 99, "a"), (3L, 30, "b"),
      (4L, 40, "c"), (5L, 50, "b")))
    // dynamic overwrite: the untouched partition's files are byte-for-byte
    // the originals (same names, same mtimes — never rewritten)
    assert(cFiles() == before, "partition c must not be rewritten")
    // an empty batch is a no-op, not a corpus wipe
    PartitionedSink.upsertByKey(batch.filter(lit(false)), out, "part", "id")
    assert(spark.read.parquet(out).count() == 5)
  }

  test("upsertByKey: null partition rows are carried, not silently dropped") {
    import spark.implicits._
    val out = freshDir()
    val base = Seq((1L, Some("a"), 10), (2L, None, 20), (3L, None, 30))
      .toDF("id", "part", "v")
    PartitionedSink.writePartitioned(base, out, Seq("part"), Seq("id"))
    // batch touches the null partition: replaces id 3, must CARRY id 2
    // (a bare isin(null) filter evaluates NULL and would lose it)
    val batch = Seq((3L, Option.empty[String], 99)).toDF("id", "part", "v")
    PartitionedSink.upsertByKey(batch, out, "part", "id")
    val got = spark.read.parquet(out).select("id", "v")
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 10), (2L, 20), (3L, 99)))
  }

  test("upsertByKey: assertStableKeys fails fast when a key changed partitions") {
    import spark.implicits._
    val out = freshDir()
    val base = Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30)).toDF("id", "part", "v")
    PartitionedSink.writePartitioned(base, out, Seq("part"), Seq("id"))
    // key 2 moves a -> b: partition a is untouched, so the stale copy
    // would survive — the debug assertion must catch it
    val moved = Seq((2L, "b", 99)).toDF("id", "part", "v")
    val e = intercept[IllegalStateException] {
      PartitionedSink.upsertByKey(moved, out, "part", "id", assertStableKeys = true)
    }
    assert(e.getMessage.contains("must not change partitions"))
    // a partition-stable batch passes the same assertion
    PartitionedSink.upsertByKey(Seq((2L, "a", 99)).toDF("id", "part", "v"),
      out, "part", "id", assertStableKeys = true)
    val got = spark.read.parquet(out).select("id", "v")
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 10), (2L, 99), (3L, 30)))
  }

  test("read-back scan prunes partitions on the partition predicate") {
    val out = freshDir()
    PartitionedSink.writePartitioned(docs, out, Seq("lang"), Seq("doc_id"))
    val some = docs.select("lang").head().getString(0)
    val pruned = spark.read.parquet(out).filter(col("lang") === some)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected partition pruning in:\n$plan")
    assert(pruned.count() == docs.filter(col("lang") === some).count())
  }

  test("rows are clustered by the sort column within each output file") {
    val out = freshDir()
    PartitionedSink.writePartitioned(docs, out, Seq("lang"), Seq("doc_id"))
    val files = new java.io.File(out).listFiles().filter(_.getName.startsWith("lang="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    for (f <- files) {
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"${f.getName} not clustered by doc_id")
    }
  }
}
