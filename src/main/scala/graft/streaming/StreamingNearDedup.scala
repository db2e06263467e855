package graft.streaming

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions.col

import graft.ops.Dedup

/** Streaming NEAR-dedup across micro-batches — the streaming counterpart
  * of [[graft.ops.Dedup.crossCorpusNearDedup]], the way
  * `dropDuplicatesWithinWatermark` is the streaming counterpart of exact
  * dedup: each arriving batch is near-deduplicated (shingle-Jaccard >=
  * threshold, MinHash-banded candidates, exact verification) against the
  * KEPT rows of every PRIOR batch, and its survivors join the history.
  * First occurrence wins, across the whole stream.
  *
  * State is the sink itself: kept rows land in an
  * [[IdempotentParquetSink]] layout (`batch_id=N` partitions), and the
  * history for batch N is the sink filtered to `batch_id < N` — so a
  * replayed batch (crash between sink write and checkpoint commit) never
  * sees its own torn previous write and never dedups against itself;
  * overwrite-by-batch-id then replaces that torn output. Exactly-once
  * end-to-end, no separate state store, and the history scan prunes by
  * the hive partition column.
  *
  * Batch-INTERNAL near-duplicates are deliberately kept (the
  * [[graft.ops.Dedup.nearDedup]] stage owns those — same contract as the
  * batch operator). At production scale the history side would band once
  * and persist postings instead of re-banding per batch; this mirrors
  * [[graft.ops.Dedup.crossCorpusNearDedup]]'s documented trade.
  */
object StreamingNearDedup {

  /** The `foreachBatch` body. Usage:
    * {{{
    * stream.writeStream.foreachBatch { (b, id) =>
    *   StreamingNearDedup.dedupBatch(b, id, sinkDir, "doc_id", "text")
    * }
    * }}}
    */
  def dedupBatch(
      batch: Dataset[Row],
      batchId: Long,
      sinkDir: String,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      maxBucketSize: Int = 1000): Unit = {
    val spark = batch.sparkSession
    val sinkExists = {
      val p = new org.apache.hadoop.fs.Path(sinkDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    val kept =
      if (!sinkExists || batchId == 0L) batch
      else {
        val history = spark.read.parquet(sinkDir)
          .filter(col("batch_id") < batchId)
          .drop("batch_id")
        Dedup.crossCorpusNearDedup(batch, history, idCol, textCol,
          threshold, shingleN, numHashes, bands, maxBucketSize)
      }
    IdempotentParquetSink.writeBatch(kept, batchId, sinkDir)
  }
}
