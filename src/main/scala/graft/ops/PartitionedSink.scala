package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partitioned, clustered parquet output — the write half of a training-data
  * pipeline (the read half is partition pruning + predicate pushdown, which
  * Spark gives for free once the layout exists).
  *
  * The naive `df.write.partitionBy(cols)` has a scale trap: every task
  * holds an open writer for EVERY partition value it encounters, so T tasks
  * x P partition values = T*P small files (and T*P writer buffers in
  * memory). The fix is the standard one: shuffle BY the partition columns
  * first so each task owns few partition values, and salt the shuffle key
  * so one giant partition value (the skew case: `lang=en` at 80% of a
  * corpus) still spreads over `filesPerPartition` tasks instead of one
  * straggler writing one enormous file.
  *
  * `sortCols` cluster rows WITHIN each output file (`sortWithinPartitions`
  * — a per-task sort, no extra shuffle), which is what makes min/max
  * row-group statistics selective for later range predicates on those
  * columns.
  */
object PartitionedSink {

  /** Write `df` to `path` as parquet partitioned by `partCols`, salted to
    * `filesPerPartition` files per partition value, rows clustered by
    * `sortCols` within files. Verification is the caller's read-back (see
    * q_partitioned_write) — returning a count here would re-scan the whole
    * output a second time for a number most callers drop.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partCols: Seq[String],
      sortCols: Seq[String],
      filesPerPartition: Int = 4): Unit = {
    require(partCols.nonEmpty, "partCols must not be empty")
    val salt: Column =
      if (filesPerPartition <= 1) lit(0)
      else if (sortCols.nonEmpty) pmod(hash(sortCols.map(col): _*), lit(filesPerPartition))
      // long arithmetic: hash() spans the full Int range, so an Int add of
      // spark_partition_id() overflows with probability pid/2^32 per row —
      // a guaranteed ArithmeticException at billions of rows under ANSI mode
      else pmod(hash(partCols.map(col): _*).cast("long") + spark_partition_id(),
        lit(filesPerPartition.toLong))
    val shuffled = df
      .withColumn("__salt", salt)
      .repartition((partCols.map(col) :+ col("__salt")): _*)
      .drop("__salt")
    val clustered =
      if (sortCols.isEmpty) shuffled
      else shuffled.sortWithinPartitions((partCols ++ sortCols).map(col): _*)
    clustered.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
  }
}
