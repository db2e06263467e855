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
