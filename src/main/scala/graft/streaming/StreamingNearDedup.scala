package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions.col

import graft.ops.{BandPostings, Dedup}

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
  * HISTORY IS BANDED ONCE, not once per batch: survivors' LSH band
  * postings persist beside the sink (`_postings`, invisible to the sink's
  * parquet reads) via [[graft.ops.BandPostings]], and each batch runs
  * [[graft.ops.Dedup.crossCorpusNearDedupWithPostings]] — its own
  * banding plus one join against the postings, instead of re-running the
  * history's minhash pipeline every batch (O(total-history) CPU per
  * batch, the round-10 shape). Postings compose by union (band keys are
  * a pure per-row function); the replay path stays exactly-once because
  * a replayed batch's own postings rows find no `batch_id < N` text at
  * verification, and the per-(id, band, bkey) dedup makes the postings
  * update idempotent. A sink without postings (pre-upgrade checkpoint, or
  * a crash between sink write and postings save) falls back to re-banding
  * that one batch, then repairs the postings.
  *
  * Batch-INTERNAL near-duplicates are deliberately kept (the
  * [[graft.ops.Dedup.nearDedup]] stage owns those — same contract as the
  * batch operator).
  */
object StreamingNearDedup {

  private val PostingsDirName = "_postings"

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
    val fs = new Path(sinkDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val postingsDir = s"$sinkDir/$PostingsDirName"
    val sinkExists = fs.exists(new Path(sinkDir))
    val postingsExist = fs.exists(new Path(postingsDir, "_graft_band_params"))
    val kept =
      if (!sinkExists || batchId == 0L) batch
      else {
        val history = spark.read.parquet(sinkDir)
          .filter(col("batch_id") < batchId)
          .drop("batch_id")
        if (postingsExist) {
          val posts = BandPostings.load(spark, postingsDir)
          Dedup.crossCorpusNearDedupWithPostings(batch, history, posts,
            idCol, textCol, threshold, maxBucketSize)
        } else {
          Dedup.crossCorpusNearDedup(batch, history, idCol, textCol,
            threshold, shingleN, numHashes, bands, maxBucketSize)
        }
      }
    IdempotentParquetSink.writeBatch(kept, batchId, sinkDir)
    // Extend the postings with THIS batch's survivors, read back from the
    // sink (recomputing `kept`'s lineage would re-run the dedup). Ordering
    // matters for the crash windows: sink first, postings second — a crash
    // between the two leaves postings one batch behind, which the
    // fallback above repairs on the next call.
    val written = spark.read.parquet(sinkDir)
      .filter(col("batch_id") === batchId).drop("batch_id")
    val fresh = Dedup.bandPostings(written, idCol, textCol, shingleN, numHashes, bands)
    val merged =
      if (postingsExist) {
        val prev = BandPostings.load(spark, postingsDir)
        require(prev.shingleN == shingleN && prev.numHashes == numHashes &&
          prev.bands == bands,
          s"[StreamingNearDedup] banding parameters changed mid-stream: " +
            s"postings=(${prev.shingleN},${prev.numHashes},${prev.bands}) " +
            s"call=($shingleN,$numHashes,$bands)")
        BandPostings(
          prev.posts.union(fresh.posts).dropDuplicates("__idH", "__band", "__bkey"),
          shingleN, numHashes, bands)
      } else if (sinkExists && batchId > 0L) {
        // postings missing under an existing multi-batch sink: rebuild
        // from the WHOLE sink once, so the repair covers all history
        val all = spark.read.parquet(sinkDir).drop("batch_id")
        Dedup.bandPostings(all, idCol, textCol, shingleN, numHashes, bands)
      } else fresh
    merged.save(postingsDir)
  }
}
