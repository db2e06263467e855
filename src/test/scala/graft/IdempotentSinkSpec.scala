package graft

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.streaming.IdempotentParquetSink

/** The exactly-once-across-restarts contract: a drain killed AFTER a
  * batch's sink write but BEFORE its checkpoint commit replays that batch
  * on restart. Plain `mode("append")` duplicates it; the
  * overwrite-by-batch-id sink replaces it.
  */
class IdempotentSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** 4 one-file micro-batches of 10 ids each (maxFilesPerTrigger=1). */
  private def makeSource(): String = {
    val src = tmp("graft_idem_src")
    (0 until 4).foreach { i =>
      spark.range(i * 10L, (i + 1) * 10L).coalesce(1)
        .write.mode("append").parquet(src)
    }
    src
  }

  private def startDrain(
      src: String,
      sinkDir: String,
      ckpt: String,
      idempotent: Boolean,
      crashAtBatch: Option[Long]): StreamingQuery =
    spark.readStream.schema(StructType.fromDDL("id LONG"))
      .option("maxFilesPerTrigger", "1").parquet(src)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (idempotent) IdempotentParquetSink.writeBatch(b, id, sinkDir)
        else b.write.mode("append").parquet(sinkDir)
        // crash AFTER the sink write, BEFORE foreachBatch returns — the
        // checkpoint commit for this batch never happens, so a restart
        // replays it: the exact double-write window
        if (crashAtBatch.contains(id)) sys.error(s"injected crash in batch $id")
      }
      .trigger(Trigger.AvailableNow())
      .start()

  test("overwrite-by-batch-id sink: batch replayed after a mid-drain kill is not duplicated") {
    val (src, sink, ckpt) = (makeSource(), tmp("graft_idem_sink"), tmp("graft_idem_ckpt"))
    val killed = startDrain(src, sink, ckpt, idempotent = true, crashAtBatch = Some(1L))
    intercept[Exception](killed.awaitTermination())
    // batch 1's output is on disk but uncommitted — the restart replays it
    val resumed = startDrain(src, sink, ckpt, idempotent = true, crashAtBatch = None)
    resumed.awaitTermination()
    val got = IdempotentParquetSink.read(spark, sink).as[Long].collect().sorted.toSeq
    assert(got == (0L until 40L)) // every id exactly once
  }

  test("fresh checkpoint against a dirty sink dir clears the previous incarnation") {
    val (src, sink) = (makeSource(), tmp("graft_gen_sink"))
    // previous incarnation left batches on disk, including a HIGH batch id
    // this run will never reach
    spark.range(9000L, 9010L).toDF("id").write.parquet(s"$sink/batch_id=99")
    val q = startDrain(src, sink, tmp("graft_gen_ckpt"), idempotent = true, crashAtBatch = None)
    q.awaitTermination()
    val got = IdempotentParquetSink.read(spark, sink).as[Long].collect().sorted.toSeq
    assert(got == (0L until 40L), s"stale generation leaked: ${got.filter(_ >= 9000L)}")
  }

  test("plain append sink duplicates the replayed batch under the same kill (the gap being closed)") {
    val (src, sink, ckpt) = (makeSource(), tmp("graft_app_sink"), tmp("graft_app_ckpt"))
    val killed = startDrain(src, sink, ckpt, idempotent = false, crashAtBatch = Some(1L))
    intercept[Exception](killed.awaitTermination())
    val resumed = startDrain(src, sink, ckpt, idempotent = false, crashAtBatch = None)
    resumed.awaitTermination()
    val got = spark.read.parquet(sink).as[Long].collect().toSeq
    assert(got.size == 50) // 40 + the 10-row replayed batch, written twice
    assert(got.distinct.size == 40)
  }
}
