package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.ops.{BandPostings, Dedup, DirLock, PartitionedSink}

/** [[graft.ops.DirLock]] — the single-writer lease the read-modify-write
  * sinks run under. Pinned: atomic acquire/contend/release, THREAD-scoped
  * reentrancy (the documented withLock{ …save… } cycle), stale-break via
  * atomic rename (incl. torn/empty leases via the mtime fallback),
  * double-release idempotence, the true concurrent race, and the
  * protected interleaving on both guarded sinks. Reentrancy is scoped to
  * the holding thread, so "another writer" in these tests is another
  * THREAD (a separate process behaves identically); handles release on
  * their acquiring thread, per the class contract.
  */
class DirLockSpec extends SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"dirlock_$tag").toString + "/artifact"

  /** Run `f` on a fresh thread (a DISTINCT writer under thread-scoped
    * reentrancy) and return its result or failure. */
  private def onOtherThread[A](f: => A): Either[Throwable, A] = {
    var r: Either[Throwable, A] = Left(new AssertionError("not run"))
    val th = new Thread(() => r = try Right(f) catch { case e: Throwable => Left(e) })
    th.start(); th.join()
    r
  }

  /** Acquire AND release on another thread: "could a fresh writer get
    * the lease right now?" */
  private def otherWriterWins(dir: String, breakStaleAfterMs: Long = Long.MaxValue)
      : Boolean =
    onOtherThread(DirLock.acquire(spark, dir, breakStaleAfterMs).release()).isRight

  /** A holder living on its own thread: acquires eagerly, releases (on
    * that same thread) when told. Simulates a concurrent writer, and —
    * when never released — a crashed one. */
  private final class Holder(dir: String) {
    private val acquired = new CountDownLatch(1)
    private val releaseCmd = new CountDownLatch(1)
    @volatile private var failure: Option[Throwable] = None
    private val th = new Thread(() => {
      try {
        val l = DirLock.acquire(spark, dir)
        acquired.countDown()
        releaseCmd.await()
        l.release()
      } catch { case e: Throwable => failure = Some(e); acquired.countDown() }
    })
    th.setDaemon(true) // an abandoned holder must not block JVM exit
    th.start()
    require(acquired.await(30, TimeUnit.SECONDS), "holder did not start")
    failure.foreach(throw _)
    def releaseAndJoin(): Unit = { releaseCmd.countDown(); th.join() }
    /** Leave the lease behind (crashed-holder simulation): the daemon
      * thread stays parked; only the on-disk lease matters to others. */
    def abandon(): Unit = ()
  }

  test("acquire / contend (other writer) / release") {
    val dir = tmp("basic")
    val l1 = DirLock.acquire(spark, dir)
    val e = onOtherThread(DirLock.acquire(spark, dir)).swap
      .getOrElse(fail("second writer unexpectedly won"))
    assert(e.getMessage.contains("locked by another writer"))
    assert(e.getMessage.contains(".graft_lock"))
    l1.release()
    assert(otherWriterWins(dir)) // released lease is re-acquirable
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

  test("reentrant on the holding thread: withLock { save } — the documented cycle") {
    import spark.implicits._
    val dir = tmp("reenter")
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val posts = Dedup.bandPostings(docs, "doc_id", "text")
    // the load->union->save shape from the BandPostings scaladoc: the
    // cycle lock is held, save's per-call lock must RE-ENTER, not throw
    DirLock.withLock(spark, dir) {
      posts.save(dir)
      posts.save(dir) // second generation inside the same cycle
    }
    assert(otherWriterWins(dir)) // fully released afterwards
    assert(BandPostings.load(spark, dir).posts.count() === posts.posts.count())
  }

  test("nested release keeps the lease until the outermost handle releases") {
    val dir = tmp("nest")
    val outer = DirLock.acquire(spark, dir)
    val inner = DirLock.acquire(spark, dir) // re-enters on this thread
    inner.release()
    assert(!otherWriterWins(dir)) // still held
    outer.release()
    assert(otherWriterWins(dir))
  }

  test("double release is idempotent and cannot unlock a successor") {
    val dir = tmp("double")
    val l1 = DirLock.acquire(spark, dir)
    l1.release()
    val l2 = DirLock.acquire(spark, dir)
    l1.release() // stale handle: must NOT delete l2's lease
    assert(!otherWriterWins(dir), "stale double-release unlocked a successor's lease")
    l2.release()
  }

  test("release off the acquiring thread refuses without burning the handle") {
    val dir = tmp("xthread")
    val l = DirLock.acquire(spark, dir)
    assert(onOtherThread(l.release()).isRight) // warns, does nothing
    assert(!otherWriterWins(dir), "cross-thread release dropped the lease")
    l.release() // the CORRECT thread's release still works (latch not spent)
    assert(otherWriterWins(dir))
  }

  test("stale-break: an old lease can be displaced, a fresh one cannot") {
    val dir = tmp("stale")
    val crashed = new Holder(dir) // never released: simulated crashed holder
    crashed.abandon()
    // fresh lease + threshold 1h: still refused
    assert(!otherWriterWins(dir, breakStaleAfterMs = 3600 * 1000L))
    Thread.sleep(60)
    // older than 50ms: broken (atomic rename) and re-acquired
    assert(otherWriterWins(dir, breakStaleAfterMs = 50L))
  }

  test("release only removes OUR lease (stale-break race)") {
    val dir = tmp("race")
    val l1 = DirLock.acquire(spark, dir)
    Thread.sleep(60)
    // another writer judges l1 stale, breaks it, and HOLDS its own lease
    val held = new CountDownLatch(1); val done = new CountDownLatch(1)
    var breakerLock: Option[DirLock] = None
    val t = new Thread(() => {
      breakerLock = Some(DirLock.acquire(spark, dir, breakStaleAfterMs = 50L))
      held.countDown()
      done.await()
      breakerLock.foreach(_.release())
    })
    t.start()
    assert(held.await(30, TimeUnit.SECONDS))
    l1.release() // must NOT delete the breaker's live lease
    assert(!otherWriterWins(dir))
    done.countDown(); t.join()
    assert(otherWriterWins(dir))
  }

  test("an empty/torn lease (holder died mid-create) is breakable via mtime") {
    val dir = tmp("torn")
    val lockFile = new java.io.File(
      DirLock.lockPathFor(new org.apache.hadoop.fs.Path(dir)).toUri.getPath)
    lockFile.getParentFile.mkdirs()
    assert(lockFile.createNewFile()) // zero-byte lease, no timestamp inside
    // fresh: refused even with a threshold (mtime too new)
    assert(!otherWriterWins(dir, breakStaleAfterMs = 3600 * 1000L))
    Thread.sleep(60)
    assert(otherWriterWins(dir, breakStaleAfterMs = 50L))
  }

  test("orphaned break tombstones are swept by the next winner — but only AGED ones") {
    val dir = tmp("tomb")
    val lockFile = new java.io.File(
      DirLock.lockPathFor(new org.apache.hadoop.fs.Path(dir)).toUri.getPath)
    lockFile.getParentFile.mkdirs()
    val orphan = new java.io.File(lockFile.getParentFile,
      lockFile.getName + ".broken.deadbeef")
    assert(orphan.createNewFile()) // breaker crashed between rename and delete
    val fresh = new java.io.File(lockFile.getParentFile,
      lockFile.getName + ".broken.cafebabe")
    assert(fresh.createNewFile()) // an IN-FLIGHT breaker's tombstone (mtime now)
    // age the orphan past the sweep gate; leave `fresh` at mtime=now
    assert(orphan.setLastModified(System.currentTimeMillis() - 120000L))
    DirLock.acquire(spark, dir).release()
    assert(!orphan.exists(), "winner did not sweep the aged orphaned tombstone")
    // a fresh tombstone may belong to a breaker still inside its
    // verify/rollback window — deleting it could destroy a live lease's
    // rollback path, so the sweep must leave it alone
    assert(fresh.exists(), "winner swept a fresh (possibly in-flight) tombstone")
    fresh.delete()
  }

  test("orphaned age-probe files are swept too — same age gate") {
    val dir = tmp("probe")
    val lockFile = new java.io.File(
      DirLock.lockPathFor(new org.apache.hadoop.fs.Path(dir)).toUri.getPath)
    lockFile.getParentFile.mkdirs()
    // a winner that crashed between fs.create(probe) and fs.delete(probe)
    // orphans the probe forever — nothing else references it
    val orphan = new java.io.File(lockFile.getParentFile,
      lockFile.getName + ".probe.deadbeef")
    assert(orphan.createNewFile())
    assert(orphan.setLastModified(System.currentTimeMillis() - 120000L))
    val fresh = new java.io.File(lockFile.getParentFile,
      lockFile.getName + ".probe.cafebabe")
    assert(fresh.createNewFile()) // a LIVE winner's probe (mtime now)
    DirLock.acquire(spark, dir).release()
    assert(!orphan.exists(), "winner did not sweep the aged orphaned probe")
    assert(fresh.exists(), "winner swept a fresh (possibly live) probe")
    fresh.delete()
  }

  test("true concurrent race: exactly one of N simultaneous acquires wins") {
    val dir = tmp("conc")
    val n = 8
    val gate = new CountDownLatch(1)
    val allAttempted = new CountDownLatch(n)
    val pool = Executors.newFixedThreadPool(n)
    try {
      val futs = (0 until n).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            gate.await()
            val won =
              try Some(DirLock.acquire(spark, dir))
              catch { case _: java.io.IOException => None }
            allAttempted.countDown()
            allAttempted.await() // hold until every contender has attempted
            won.foreach(_.release()) // release on the ACQUIRING thread
            won.isDefined
          }
        })
      }
      gate.countDown()
      val winners = futs.count(_.get())
      assert(winners === 1, s"expected exactly one winner, got $winners")
      assert(otherWriterWins(dir)) // lease fully released afterwards
    } finally pool.shutdown()
  }

  test("upsertByKey fails loudly while another writer holds the lease") {
    import spark.implicits._
    val dir = tmp("upsert")
    val base = Seq((1L, "en", "a"), (2L, "de", "b")).toDF("id", "lang", "v")
    PartitionedSink.writePartitioned(base, dir, Seq("lang"), Seq("id"), 1)
    val patch = Seq((1L, "en", "A2")).toDF("id", "lang", "v")
    val holder = new Holder(dir)
    val e = onOtherThread(PartitionedSink.upsertByKey(patch, dir, "lang", "id"))
      .swap.getOrElse(fail("upsert unexpectedly proceeded under a held lease"))
    assert(e.getMessage.contains("locked by another writer"))
    // the guarded state is untouched by the refused writer
    assert(spark.read.parquet(dir).filter($"id" === 1L && $"v" === "a").count() === 1)
    holder.releaseAndJoin()
    PartitionedSink.upsertByKey(patch, dir, "lang", "id") // now proceeds
    assert(spark.read.parquet(dir).filter($"id" === 1L && $"v" === "A2").count() === 1)
  }

  test("BandPostings.save fails loudly while another writer holds the lease") {
    import spark.implicits._
    val dir = tmp("postings")
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val posts = Dedup.bandPostings(docs, "doc_id", "text")
    val holder = new Holder(dir)
    val e = onOtherThread(posts.save(dir))
      .swap.getOrElse(fail("save unexpectedly proceeded under a held lease"))
    assert(e.getMessage.contains("locked by another writer"))
    holder.releaseAndJoin()
    posts.save(dir)
    assert(BandPostings.load(spark, dir).posts.count() === posts.posts.count())
    // save-over-save (the nightly maintenance flow) still works solo
    posts.save(dir)
  }
}
