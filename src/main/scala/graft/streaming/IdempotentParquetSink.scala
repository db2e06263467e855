package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}

/** Exactly-once parquet sink for `foreachBatch` streaming drains, across
  * RESTARTS — the failure plain `mode("append")` cannot survive: if a
  * drain dies after a batch's sink write but before its checkpoint commit,
  * the restart replays that batch and append writes it twice.
  *
  * The standard idempotent-replay fix (the same contract Spark's own
  * FileStreamSink implements with its file-manifest log): each batch
  * writes to its OWN `batch_id=N` subdirectory with `mode("overwrite")`,
  * so a replayed batch replaces its previous (possibly torn) output
  * instead of duplicating it. `foreachBatch` + checkpoint guarantees batch
  * ids are stable across restarts, which makes overwrite-by-batch-id
  * exactly-once end-to-end for deterministic batch contents.
  *
  * Scale posture: the sink directory is a normal hive-partitioned parquet
  * layout (`batch_id` as partition column), so downstream readers get
  * partition pruning per batch for free, and no driver-side manifest state
  * exists beyond Spark's own checkpoint.
  */
object IdempotentParquetSink {

  /** The `foreachBatch` body: write this micro-batch to its own
    * batch-keyed subdirectory, replacing any torn output from a previous
    * attempt of the SAME batch id.
    *
    * Batch 0 additionally clears the whole sink directory: a stream can
    * only be AT batch 0 when it starts from a fresh checkpoint (a resumed
    * stream replays from its last uncommitted id), so anything on disk is
    * a previous incarnation's output — without this, old `batch_id=N`
    * partitions beyond the new run's ids would silently survive and
    * `read` would mix the two generations.
    */
  def writeBatch(batch: Dataset[Row], batchId: Long, sinkDir: String): Unit = {
    if (batchId == 0L) {
      val p = new org.apache.hadoop.fs.Path(sinkDir)
      val fs = p.getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    batch.write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")
  }

  /** Read the sink back without the bookkeeping column. Partition
    * discovery turns the `batch_id=N` layout into a `batch_id` column;
    * callers see only the query schema.
    */
  def read(spark: SparkSession, sinkDir: String): DataFrame =
    spark.read.parquet(sinkDir).drop("batch_id")
}
