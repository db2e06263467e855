package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * with `FileSystem.create(overwrite = false)` — atomic
  * create-if-absent on HDFS and local filesystems — and fails LOUDLY
  * (lock path, current holder, held-since) when the lease is already
  * held. The lock lives NEXT TO the guarded directory, never inside it,
  * because the guarded directory itself is deleted and re-created by
  * the swap it protects.
  *
  * Scope rules:
  *  - the sink ops acquire per CALL (the whole call is one
  *    read-modify-write, so per-call locking removes both races between
  *    library callers);
  *  - a MULTI-STEP cycle the library cannot see end-to-end (load a
  *    KeyBloom, extend it over a job, save it back) must hold one
  *    [[DirLock]] across the WHOLE cycle — per-step locking would
  *    serialize the steps but not prevent the lost update.
  *
  * Failure and staleness: a crashed holder leaves the lock file behind
  * (a lease file, not an OS lock — nothing auto-expires). The error
  * message carries the holder id and acquisition time; a human (or an
  * orchestrator that knows the holder is dead) removes the file or
  * re-acquires with `breakStaleAfterMs` set, which deletes-and-retries
  * once when the lease is older than the threshold. Choose a threshold
  * far above the longest legitimate cycle — breaking a LIVE writer's
  * lease reintroduces both races.
  *
  * Object-store caveat (documented, not hidden): S3-style stores
  * implement `create(overwrite=false)` as check-then-put, which is not
  * atomic under contention — there the lock degrades to best-effort and
  * the real contract is the orchestrator's (single scheduled writer per
  * directory, the ARCHITECTURE.md deployment note).
  */
final class DirLock private (fs: FileSystem, val lockPath: Path, token: String) {

  /** Delete the lease. Only removes OUR lease: if the file no longer
    * holds this lock's token (a stale-break raced us), it is left alone
    * and a warning is logged — deleting another writer's live lease
    * would be worse than leaking ours.
    */
  def release(): Unit = {
    val current =
      try Some(DirLock.readContents(fs, lockPath))
      catch { case _: java.io.IOException => None }
    if (current.exists(_.startsWith(token + "\n"))) fs.delete(lockPath, false)
    else org.slf4j.LoggerFactory.getLogger(getClass).warn(
      s"[graft] not releasing $lockPath: lease no longer ours " +
        s"(stale-break raced this holder?)")
  }
}

object DirLock {

  /** Acquire the single-writer lease guarding `dir`. Throws
    * [[java.io.IOException]] with the holder's identity when already
    * held (unless `breakStaleAfterMs` is set and the lease is older).
    */
  def acquire(
      spark: SparkSession,
      dir: String,
      breakStaleAfterMs: Long = Long.MaxValue): DirLock = {
    val conf = spark.sparkContext.hadoopConfiguration
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    val lock = lockPathFor(d)
    val token = java.util.UUID.randomUUID().toString
    val owner = s"${spark.sparkContext.applicationId}@" +
      java.net.InetAddress.getLocalHost.getHostName
    def tryCreate(): Boolean =
      try {
        val out = fs.create(lock, false) // overwrite=false: atomic on HDFS/local
        try out.write(s"$token\n$owner\n${System.currentTimeMillis()}\n".getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (tryCreate()) return new DirLock(fs, lock, token)
    // held: read the holder for the error (or the staleness decision)
    val contents =
      try readContents(fs, lock)
      catch { case _: java.io.IOException => "" } // holder released mid-race
    val lines = contents.split("\n", -1)
    val heldSince = if (lines.length >= 3) lines(2).toLongOption else None
    val age = heldSince.map(System.currentTimeMillis() - _)
    if (age.exists(_ > breakStaleAfterMs)) {
      fs.delete(lock, false)
      if (tryCreate()) return new DirLock(fs, lock, token)
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
    * load→modify→save cycles. */
  def withLock[A](spark: SparkSession, dir: String)(f: => A): A = {
    val l = acquire(spark, dir)
    try f finally l.release()
  }

  private[ops] def lockPathFor(dir: Path): Path = {
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
