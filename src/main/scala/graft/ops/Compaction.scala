package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the maintenance operator every long-running
  * ingest pipeline needs: micro-batch sinks, partitioned writers, and
  * per-task outputs accrete thousands of KB-scale parquet files whose
  * per-file open/footer cost eventually dominates scans.
  *
  * Shape chosen for scale: the input is re-read with the scan's split size
  * pinned to the compaction target (so input partitions arrive
  * target-sized) and merged down with `coalesce`, which is a NARROW
  * dependency — no shuffle, no sort, each output file is written by one
  * task that drains its bin of input files. `CompactionSpec` asserts the
  * no-Exchange plan; the data itself is untouched (the q_compaction oracle
  * aggregates the compacted copy against the source table).
  *
  * Listing is a driver-side metadata op bounded by the file count — the
  * same cost any planner pays to enumerate splits; no row ever reaches the
  * driver.
  */
object Compaction {

  /** Input inventory: data file count and total bytes under `dir`
    * (non-recursive over hidden/metadata files, recursive over
    * subdirectories — hive-partitioned layouts compact too).
    */
  def inventory(spark: SparkSession, dir: String): (Int, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        n += 1; bytes += f.getLen
      }
    }
    (n, bytes)
  }

  /** Bin count for a target output size: ceil(totalBytes / targetBytes),
    * min 1. Compressed parquet re-compresses at roughly input size, so
    * bytes-in is the practical proxy for bytes-out.
    */
  def planBins(spark: SparkSession, dir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val (_, bytes) = inventory(spark, dir)
    math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
  }

  /** The compacted frame + its bin count, NOT yet written — exposed so
    * callers (and the plan spec) can inspect the no-shuffle plan. Split
    * size is pinned to the target via a read option (per-relation, not a
    * session mutation) so each of the `nBins` tasks drains a contiguous
    * target-sized bin of input files.
    */
  def compactedFrame(spark: SparkSession, inDir: String, targetBytes: Long): (DataFrame, Int) = {
    val nBins = planBins(spark, inDir, targetBytes)
    val df = spark.read
      .option("maxPartitionBytes", targetBytes.toString)
      // tiny files otherwise round UP to one partition each via open cost
      .option("openCostInBytes", "0")
      .parquet(inDir)
      .coalesce(nBins)
    (df, nBins)
  }

  /** Compact `inDir` into ~`targetBytes` files at `outDir`; returns
    * (filesBefore, filesAfter). */
  def compact(spark: SparkSession, inDir: String, outDir: String, targetBytes: Long): (Int, Int) = {
    val (before, _) = inventory(spark, inDir)
    val (df, _) = compactedFrame(spark, inDir, targetBytes)
    df.write.mode("overwrite").parquet(outDir)
    val (after, _) = inventory(spark, outDir)
    (before, after)
  }
}
