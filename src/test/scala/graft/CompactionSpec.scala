package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.ops.Compaction

class CompactionSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_compact_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def writeFragmented(n: Int): String = {
    val dir = freshDir("in")
    spark.read.parquet(s"$sf/documents.parquet")
      .repartition(n)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("compaction merges many tiny files to the planned bin count, losslessly") {
    val in = writeFragmented(32)
    val (filesBefore, bytes) = Compaction.inventory(spark, in)
    assert(filesBefore == 32, s"fixture should have 32 data files, got $filesBefore")
    val target = math.max(1L, bytes / 4) // plan ~4-5 bins
    val nBins = Compaction.planBins(spark, in, target)
    assert(nBins >= 4 && nBins <= 5, s"expected ~4 bins, got $nBins")
    val out = freshDir("out")
    val (_, filesAfter) = Compaction.compact(spark, in, out, target)
    assert(filesAfter == nBins, s"expected $nBins output files, got $filesAfter")
    // lossless: same multiset of rows
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("the compacted frame's plan has no shuffle (coalesce is narrow)") {
    val in = writeFragmented(16)
    val (_, bytes) = Compaction.inventory(spark, in)
    val (df, _) = Compaction.compactedFrame(spark, in, math.max(1L, bytes / 2))
    df.collect()
    val shuffles = df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, s"compaction must not shuffle:\n${df.queryExecution.executedPlan}")
  }

  test("hive-partitioned layouts inventory recursively; single file still compacts") {
    val dir = freshDir("part")
    spark.read.parquet(s"$sf/documents.parquet")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val (n, bytes) = Compaction.inventory(spark, dir)
    assert(n > 0 && bytes > 0)
    // a target far above total bytes plans exactly one bin
    assert(Compaction.planBins(spark, dir, bytes * 10) == 1)
  }

  test("invalid target is rejected") {
    intercept[IllegalArgumentException] {
      Compaction.planBins(spark, sf, 0L)
    }
  }
}
