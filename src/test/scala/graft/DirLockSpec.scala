package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{BandPostings, Dedup, DirLock, PartitionedSink}

/** [[graft.ops.DirLock]] — the single-writer lease the read-modify-write
  * sinks run under. Pinned: atomic acquire/contend/release semantics,
  * stale-break, the protected interleaving on both guarded sinks (a held
  * lease makes the second writer fail LOUDLY instead of losing rows),
  * and that the lease file never lives inside the guarded directory
  * (which the save swap deletes).
  */
class DirLockSpec extends SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"dirlock_$tag").toString + "/artifact"

  test("acquire / contend / release") {
    val dir = tmp("basic")
    val l1 = DirLock.acquire(spark, dir)
    val e = intercept[java.io.IOException](DirLock.acquire(spark, dir))
    assert(e.getMessage.contains("locked by another writer"))
    assert(e.getMessage.contains(".graft_lock"))
    l1.release()
    val l2 = DirLock.acquire(spark, dir) // released lease is re-acquirable
    l2.release()
  }

  test("lease lives NEXT TO the directory, not inside it") {
    val dir = tmp("loc")
    val l = DirLock.acquire(spark, dir)
    val lockFile = new java.io.File(l.lockPath.toUri.getPath)
    assert(lockFile.exists())
    assert(lockFile.getParentFile.getAbsolutePath ===
      new java.io.File(dir).getParentFile.getAbsolutePath)
    l.release()
    assert(!lockFile.exists())
  }

  test("stale-break: an old lease can be displaced, a fresh one cannot") {
    val dir = tmp("stale")
    DirLock.acquire(spark, dir) // never released: simulated crashed holder
    // fresh lease + threshold 1h: still refused
    intercept[java.io.IOException](
      DirLock.acquire(spark, dir, breakStaleAfterMs = 3600 * 1000L))
    Thread.sleep(60)
    // older than 50ms: broken and re-acquired
    val l = DirLock.acquire(spark, dir, breakStaleAfterMs = 50L)
    l.release()
  }

  test("release only removes OUR lease (stale-break race)") {
    val dir = tmp("race")
    val l1 = DirLock.acquire(spark, dir)
    Thread.sleep(60)
    val l2 = DirLock.acquire(spark, dir, breakStaleAfterMs = 50L) // breaks l1
    l1.release() // must NOT delete l2's live lease
    intercept[java.io.IOException](DirLock.acquire(spark, dir))
    l2.release()
  }

  test("true concurrent race: exactly one of N simultaneous acquires wins") {
    val dir = tmp("conc")
    val n = 8
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futs = (0 until n).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Option[graft.ops.DirLock]] {
          def call(): Option[graft.ops.DirLock] = {
            gate.await()
            try Some(DirLock.acquire(spark, dir))
            catch { case _: java.io.IOException => None }
          }
        })
      }
      gate.countDown()
      val winners = futs.map(_.get()).flatten
      assert(winners.size === 1, s"expected exactly one winner, got ${winners.size}")
      winners.head.release()
      DirLock.acquire(spark, dir).release() // lease fully released
    } finally pool.shutdown()
  }

  test("upsertByKey fails loudly while another writer holds the lease") {
    import spark.implicits._
    val dir = tmp("upsert")
    val base = Seq((1L, "en", "a"), (2L, "de", "b")).toDF("id", "lang", "v")
    PartitionedSink.writePartitioned(base, dir, Seq("lang"), Seq("id"), 1)
    val patch = Seq((1L, "en", "A2")).toDF("id", "lang", "v")
    val held = DirLock.acquire(spark, dir)
    val e = intercept[java.io.IOException](
      PartitionedSink.upsertByKey(patch, dir, "lang", "id"))
    assert(e.getMessage.contains("locked by another writer"))
    // the guarded state is untouched by the refused writer
    assert(spark.read.parquet(dir).filter($"id" === 1L && $"v" === "a").count() === 1)
    held.release()
    PartitionedSink.upsertByKey(patch, dir, "lang", "id") // now proceeds
    assert(spark.read.parquet(dir).filter($"id" === 1L && $"v" === "A2").count() === 1)
  }

  test("BandPostings.save fails loudly while another writer holds the lease") {
    import spark.implicits._
    val dir = tmp("postings")
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val posts = Dedup.bandPostings(docs, "doc_id", "text")
    val held = DirLock.acquire(spark, dir)
    val e = intercept[java.io.IOException](posts.save(dir))
    assert(e.getMessage.contains("locked by another writer"))
    held.release()
    posts.save(dir)
    assert(BandPostings.load(spark, dir).posts.count() === posts.posts.count())
    // save-over-save (the nightly maintenance flow) still works solo
    posts.save(dir)
  }
}
