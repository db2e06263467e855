package graft.ops

import org.apache.hadoop.fs.{FileSystem, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.spark.sql.SparkSession

/** Advisory single-writer lease for a persisted-artifact directory — the
  * concurrency contract for the library's read-modify-write sinks
  * ([[PartitionedSink.upsertByKey]], [[BandPostings.save]], the
  * KeyBloom load→extend→save cycle).
  *
  * Two jobs maintaining the same directory race in two distinct ways:
  *  1. TORN STATE — overlapping delete→rename (BandPostings.save) or
  *     dynamic-partition-overwrite commits (upsertByKey) can interleave
  *     so the surviving directory is a mix of both writers' files.
  *  2. LOST UPDATE — both load generation N, both write N+1; one
  *     writer's rows silently vanish even though every individual
  *     commit was atomic.
  *
  * [[acquire]] guards both: it creates `<parent>/.<name>.graft_lock`
  * with an atomic create-if-absent — `O_CREAT|O_EXCL` via
  * `File.createNewFile` on local filesystems (Hadoop's local
  * `create(overwrite=false)` is a non-atomic exists-then-create),
  * `FileSystem.create(overwrite = false)` elsewhere (atomic on HDFS) —
  * and fails LOUDLY (lock path, current holder, held-since) when the
  * lease is already held. The lock lives NEXT TO the guarded directory,
  * never inside it, because the guarded directory itself is deleted and
  * re-created by the swap it protects.
  *
  * REENTRANT within the HOLDING THREAD (the `ReentrantLock` rule): the
  * thread that already holds the lease gets a nested handle (per-path
  * refcount) instead of deadlocking on its own lock — so the documented
  * multi-step shape `DirLock.withLock(dir) { load; …; save(dir) }`
  * works even though `save` also locks per call. The lease file is
  * deleted when the LAST handle releases, on the acquiring thread.
  * Reentrancy is deliberately NOT JVM-wide: two independent threads in
  * one driver are two writers, and the second fails loudly like any
  * other contender.
  *
  * Scope rules:
  *  - the sink ops acquire per CALL (the whole call is one
  *    read-modify-write, so per-call locking removes both races between
  *    library callers);
  *  - a MULTI-STEP cycle the library cannot see end-to-end (load a
  *    KeyBloom, extend it over a job, save it back) must hold one
  *    [[DirLock]] across the WHOLE cycle — per-step locking would
  *    serialize the steps but not prevent the lost update. Reentrancy
  *    makes the inner per-call locks no-ops under the cycle lock.
  *
  * Failure and staleness: a crashed holder leaves the lock file behind
  * (a lease file, not an OS lock — nothing auto-expires). The error
  * message carries the holder id and acquisition time; a human (or an
  * orchestrator that knows the holder is dead) removes the file or
  * re-acquires with `breakStaleAfterMs` set. Age comes from the lease's
  * embedded timestamp, falling back to the FILE's modification time
  * when the contents are unreadable or torn (a holder killed between
  * create and write must still be breakable). The break itself is an
  * atomic RENAME to a unique tombstone — when two recovering jobs judge
  * the same lease stale, only one rename succeeds, the loser falls
  * through to create-if-absent and fails loudly against the winner's
  * fresh lease; a stale-break can never delete a LIVE lease.
  *
  * Object-store caveat (documented, not hidden): S3-style stores
  * implement `create(overwrite=false)` as check-then-put, which is not
  * atomic under contention — there the lock degrades to best-effort and
  * the real contract is the orchestrator's (single scheduled writer per
  * directory, the ARCHITECTURE.md deployment note).
  */
final class DirLock private[ops] (
    fs: FileSystem, val lockPath: Path, key: String, token: String) {

  private val releasedFlag = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Release this handle (idempotent; must run on the acquiring
    * thread — the reentrancy scope). The lease file is deleted only when
    * the outermost handle releases (refcount reaches zero), and only if
    * it still holds this handle's token — a lease displaced by another
    * process's stale-break is left alone (with a warning; deleting
    * another writer's live lease would be worse than leaking ours).
    *
    * A release called OFF the acquiring thread refuses (warning) and
    * does NOT consume the handle's idempotence latch — the correct
    * thread's later release still works.
    */
  def release(): Unit = {
    val m = DirLock.held.get()
    m.get(key) match {
      case Some((t, _)) if t == token =>
        // ownership confirmed on this thread; NOW consume the latch
        // (before any state change, so a double release is a pure no-op)
        if (!releasedFlag.compareAndSet(false, true)) return
        m(key) match {
          case (_, n) if n > 1 => m(key) = (t, n - 1) // nested: keep the lease
          case _ =>
            m.remove(key)
            val current =
              try Some(DirLock.readContents(fs, lockPath))
              catch { case _: java.io.IOException => None }
            if (current.exists(_.startsWith(token + "\n"))) fs.delete(lockPath, false)
            else org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"[graft] not releasing $lockPath: lease no longer ours " +
                s"(stale-break raced this holder?)")
        }
      case _ =>
        if (releasedFlag.get()) return // already released on the owner thread
        // called off the acquiring thread: the refcount lives in that
        // thread's scope, so releasing here could delete a lease a
        // nested handle still relies on — refuse, loudly, WITHOUT
        // consuming the latch
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"[graft] release() of $lockPath called off its acquiring thread; " +
            "lease NOT released (DirLock handles are thread-scoped)")
    }
  }
}

object DirLock {

  /** Minimum tombstone age (file mtime) before the winner's housekeeping
    * sweep may delete it — generous vs the breaker's rename→verify→
    * rollback window (microseconds on a local FS, well under a second on
    * an object store), so a sweep can never race an in-flight break. */
  private val TombstoneSweepAgeMs = 30000L

  /** Leases held by the CURRENT THREAD: lockPath → (token, refcount) —
    * the reentrancy scope (class doc). */
  private val held = ThreadLocal.withInitial(
    () => scala.collection.mutable.Map.empty[String, (String, Int)])

  /** Acquire the single-writer lease guarding `dir` (reentrant within
    * the JVM — see class doc). Throws [[java.io.IOException]] with the
    * holder's identity when held by another process (unless
    * `breakStaleAfterMs` is set and the lease is older).
    */
  def acquire(
      spark: SparkSession,
      dir: String,
      breakStaleAfterMs: Long = Long.MaxValue): DirLock = {
    val conf = spark.sparkContext.hadoopConfiguration
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    val lock = lockPathFor(d)
    // qualified key: "file:///data/x" and "/data/x" must re-enter the
    // SAME lease, or the documented withLock{…save} cycle fails loudly
    // against its own on-disk lock file
    val key = fs.makeQualified(lock).toString
    val token = java.util.UUID.randomUUID().toString

    // reentrant fast path: this THREAD already holds the lease
    val threadHeld = held.get()
    threadHeld.get(key) match {
      case Some((t, n)) =>
        threadHeld(key) = (t, n + 1)
        return new DirLock(fs, lock, key, t)
      case None => ()
    }

    val owner = s"${spark.sparkContext.applicationId}@" +
      java.net.InetAddress.getLocalHost.getHostName
    val contents = s"$token\n$owner\n${System.currentTimeMillis()}\n".getBytes("UTF-8")
    // local FS: Hadoop's create(overwrite=false) is exists-then-create
    // (not atomic); java.io.File.createNewFile is O_CREAT|O_EXCL
    val isLocal = fs.isInstanceOf[LocalFileSystem] || fs.isInstanceOf[RawLocalFileSystem]
    def tryCreate(): Boolean = {
      if (isLocal) {
        val f = new java.io.File(lock.toUri.getPath)
        Option(f.getParentFile).foreach(_.mkdirs())
        val created = try f.createNewFile() catch { case _: java.io.IOException => false }
        if (!created) false
        else {
          // fill the body WITHOUT create semantics (WRITE only): if a
          // tiny-threshold stale-break renamed our empty file away in
          // the microseconds since createNewFile, this fails instead of
          // silently recreating over the breaker's fresh lease. A body
          // write failure leaves a torn lease, which is BREAKABLE via
          // the mtime fallback — never deleted blindly (the path may
          // already hold another writer's lease).
          java.nio.file.Files.write(
            java.nio.file.Paths.get(lock.toUri.getPath), contents,
            java.nio.file.StandardOpenOption.WRITE)
          true
        }
      } else {
        // single-stream create: the body rides inside the same atomic
        // create(overwrite=false) — no empty-file window, and never an
        // overwrite that could clobber another writer's lease
        try {
          val out = fs.create(lock, false)
          try out.write(contents) finally out.close()
          true
        } catch { case _: java.io.IOException => false }
      }
    }
    def won(): DirLock = {
      // bounded housekeeping at a safe point (we hold the lease): sweep
      // tombstones orphaned by breakers that crashed between rename and
      // delete — best-effort, the lease itself never depends on it.
      // AGE-GATED on mtime: an IN-FLIGHT breaker is between rename and
      // verify/rollback for only microseconds, but if we deleted its
      // fresh tombstone first, a breaker that had misjudged a LIVE lease
      // as stale could no longer roll the rename back (silent rename
      // failure -> the live lease stays destroyed -> two writers). Only
      // tombstones old enough that no verify/rollback can still be in
      // flight are swept; younger orphans wait for the next winner. Age
      // is measured against a SAME-FILESYSTEM probe file's mtime, not
      // this JVM's clock — on HDFS/object stores mtimes are
      // server-assigned, and a sweeper clock >30 s ahead would otherwise
      // judge a microseconds-old tombstone "aged" and reopen the race.
      // Probe failure skips the sweep (pure housekeeping).
      try {
        val probe = new Path(lock.getParent, s"${lock.getName}.probe.$token")
        val out = fs.create(probe, false)
        out.close()
        val fsNow = fs.getFileStatus(probe).getModificationTime
        fs.delete(probe, false)
        // aged PROBE files join the same sweep: a winner that crashed
        // between creating and deleting its probe orphans it forever
        // (nothing else ever references a probe), and the same age gate
        // makes racing an in-flight winner's live probe impossible
        (Option(fs.globStatus(new Path(lock.getParent, s"${lock.getName}.broken.*")))
          .getOrElse(Array.empty) ++
         Option(fs.globStatus(new Path(lock.getParent, s"${lock.getName}.probe.*")))
          .getOrElse(Array.empty))
          .filter(s => fsNow - s.getModificationTime > TombstoneSweepAgeMs)
          .foreach(s => fs.delete(s.getPath, false))
      } catch { case _: java.io.IOException => () }
      threadHeld(key) = (token, 1)
      new DirLock(fs, lock, key, token)
    }
    if (tryCreate()) return won()

    // held by another process: read the holder for the error message /
    // staleness decision. Age = embedded timestamp, else file mtime (a
    // torn or empty lease — holder died mid-create — must be breakable).
    val judged =
      try readContents(fs, lock) catch { case _: java.io.IOException => "" }
    val lines = judged.split("\n", -1)
    val heldSince = lines.lift(2).flatMap(_.toLongOption)
      .orElse(try Some(fs.getFileStatus(lock).getModificationTime)
        catch { case _: java.io.IOException => None })
    val age = heldSince.map(System.currentTimeMillis() - _)
    if (age.exists(_ > breakStaleAfterMs)) {
      // atomic break: only ONE renamer wins the tombstone; the loser
      // falls through to tryCreate and fails loudly against the
      // winner's fresh lease. The rename is then VERIFIED against the
      // contents we judged stale — if another breaker already replaced
      // the stale lease with its own fresh one, our rename grabbed a
      // LIVE lease and must be rolled back (the read-then-rename TOCTOU).
      val tomb = new Path(lock.getParent, s"${lock.getName}.broken.$token")
      val wonBreak = try fs.rename(lock, tomb) catch { case _: java.io.IOException => false }
      if (wonBreak) {
        val tombContents =
          try readContents(fs, tomb) catch { case _: java.io.IOException => "" }
        if (tombContents == judged) {
          try fs.delete(tomb, false) catch { case _: java.io.IOException => () }
        } else {
          // renamed a lease that is NOT the one judged stale: put the
          // live lease back and contend normally. If the rollback
          // target was re-created meanwhile, leave the tombstone for
          // the next winner's sweep — never overwrite.
          try fs.rename(tomb, lock) catch { case _: java.io.IOException => () }
        }
      }
      if (tryCreate()) return won()
    }
    throw new java.io.IOException(
      s"[graft] $dir is locked by another writer (lease $lock, holder " +
        s"'${lines.lift(1).getOrElse("unknown")}', held " +
        s"${age.map(a => s"${a / 1000}s").getOrElse("unknown time")}). " +
        "Concurrent maintenance of one artifact directory loses updates; " +
        "wait for the holder, or delete the lease file if the holder is " +
        "known dead (see DirLock scaladoc / ARCHITECTURE.md).")
  }

  /** Run `f` under the lease — the recommended shape for multi-step
    * load→modify→save cycles (inner per-call locks re-enter). */
  def withLock[A](spark: SparkSession, dir: String)(f: => A): A = {
    val l = acquire(spark, dir)
    try f finally l.release()
  }

  private[graft] def lockPathFor(dir: Path): Path = {
    val parent = Option(dir.getParent).getOrElse(new Path("/"))
    new Path(parent, s".${dir.getName}.graft_lock")
  }

  private def readContents(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val arr = new Array[Byte](4096)
      var n = in.read(arr)
      while (n >= 0) { buf.write(arr, 0, n); n = in.read(arr) }
      buf.toString("UTF-8")
    } finally in.close()
  }
}
