package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lineage cutting for the ops library's materialization points.
  *
  * Iterative operators ([[DupGroups]], [[Bpe]]) and cache-release sites
  * ([[Dedup]], [[PairMatrix]], [[PartitionedSink]]) must truncate the
  * logical plan eagerly — otherwise lineage grows per round (analyzer
  * time super-linear) or the returned plan keeps referencing caches the
  * operator wants to release. `localCheckpoint` does that with zero
  * extra I/O, but its blocks live only on the executors that computed
  * them: on a real cluster an executor loss makes them IRRECOVERABLE
  * (the lineage is gone), failing the whole job, and dynamic allocation
  * can reap those executors at any time. Reliable `checkpoint` survives
  * both, at the cost of a write to the configured checkpoint directory.
  *
  * [[cut]] picks per the deployment, controlled by the session conf
  * `spark.graft.checkpoint`:
  *  - `auto` (default): reliable checkpoint iff
  *    `SparkContext.setCheckpointDir` has been called — a cluster user
  *    who configured a checkpoint dir gets durability without touching
  *    operator code; single-box sessions keep the zero-I/O path.
  *  - `reliable`: always `checkpoint(eager = true)` (requires a
  *    checkpoint dir; Spark fails loudly if unset).
  *  - `local`: always `localCheckpoint(eager = true)`.
  *  - anything else: rejected loudly (the repo's conf-typo convention —
  *    a misspelled `reliable` must not silently drop durability).
  *
  * Reliable-mode mechanics, both inherited from Spark's checkpoint
  * contract:
  *  - the file write is a SECOND job after the eager materialization
  *    (`ReliableRDDCheckpointData` re-runs the RDD), so [[cut]] persists
  *    the input around the checkpoint and unpersists after — both passes
  *    read one materialization instead of recomputing the plan twice;
  *  - checkpoint files are cleaned by the ContextCleaner only when
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` (Spark's
  *    default is false, and nothing is cleaned at application exit). Set
  *    that conf in long-running reliable-mode deployments — each round's
  *    previous checkpoint becomes unreferenced as soon as the next cut
  *    materializes, so GC-driven cleanup bounds the directory at ~one
  *    live generation per operator. Because `auto` switches to reliable
  *    merely from `setCheckpointDir` having been called (possibly for
  *    unrelated RDD work), [[cut]] warns ONCE per JVM when it selects
  *    reliable in auto mode while that cleaner conf is false — an
  *    iterative job would otherwise grow the checkpoint directory
  *    without bound and nothing would ever say so.
  *
  * [[graft.SparkEntry]]'s query-local materializations deliberately stay
  * on `localCheckpoint`: they are one-shot single-session demos where a
  * lost block fails one rerunnable query, not an hours-long iterative
  * job.
  */
private[graft] object Lineage {

  /** Once-per-JVM latch for the auto-mode unbounded-checkpoint-dir
    * warning (object doc, reliable-mode mechanics). */
  private val warnedAutoRetention = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Materialize `df` eagerly and cut its lineage (see object doc for
    * the local-vs-reliable dispatch).
    */
  def cut(df: DataFrame): DataFrame = {
    val session = df.sparkSession
    val mode = session.conf.get("spark.graft.checkpoint", "auto")
    val reliable = mode match {
      case "reliable" => true
      case "local"    => false
      case "auto"     => session.sparkContext.getCheckpointDir.isDefined
      case other => throw new IllegalArgumentException(
        s"spark.graft.checkpoint must be auto, reliable or local, got '$other'")
    }
    if (reliable && mode == "auto" &&
        !session.sparkContext.getConf
          .getBoolean("spark.cleaner.referenceTracking.cleanCheckpoints", defaultValue = false) &&
        warnedAutoRetention.compareAndSet(false, true)) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "[graft] a checkpoint dir is set, so lineage cuts use RELIABLE checkpoints " +
          "(spark.graft.checkpoint=auto), but spark.cleaner.referenceTracking." +
          "cleanCheckpoints is false: Spark never deletes checkpoint files, so " +
          "iterative operators grow the checkpoint directory without bound. Set that " +
          "conf to true (GC then bounds the dir at ~one live generation per operator) " +
          "or set spark.graft.checkpoint=local to keep zero-I/O local cuts.")
    }
    if (reliable) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      try df.checkpoint(eager = true)
      finally df.unpersist(blocking = false)
    } else df.localCheckpoint(eager = true)
  }

  /** `.cutLineage()` postfix syntax so call sites read like the
    * `.localCheckpoint(true)` chains they replace.
    */
  implicit class CutSyntax(private val df: DataFrame) extends AnyVal {
    def cutLineage(): DataFrame = cut(df)
  }

  /** Deterministic O(1) checkpoint retention for GENERATIONAL loops
    * (round N's frame is computed from round N−1's and fully supersedes
    * it — [[DupGroups]], [[Bpe]], [[KCore]], [[Bfs]],
    * [[LabelPropagation]]): `chain.cut(df)` behaves exactly like
    * [[Lineage.cut]], and in reliable mode ADDITIONALLY deletes the
    * chain's previous cut's checkpoint files once the new cut has
    * materialized — so an iterative job's checkpoint directory holds one
    * live generation per chain at all times, instead of one per round
    * (the unbounded-retention hazard the auto-mode warning flags; the
    * GC-driven `cleanCheckpoints` conf bounds it only eventually, this
    * bounds it deterministically). The FINAL cut is never deleted — the
    * returned frame reads from it until session end.
    *
    * Safety: deletion happens strictly AFTER the next cut's files exist
    * (cut is eager), and recovery from executor loss mid-round only ever
    * re-reads the CURRENT generation's files — never a deleted one
    * (dev/EXECUTOR_LOSS.md re-drives the kill scenario with chains).
    * NOT for frames that outlive the loop alongside later generations —
    * those keep plain [[cut]]. A chain is single-threaded like the loop
    * that owns it.
    */
  final class Chain private[Lineage] () {
    private var prevFile: Option[String] = None

    def cut(df: DataFrame): DataFrame = {
      val out = Lineage.cut(df)
      checkpointFileOf(out).foreach { newFile =>
        prevFile.filter(_ != newFile).foreach { p =>
          try {
            val path = new org.apache.hadoop.fs.Path(p)
            path.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
              .delete(path, true)
          } catch {
            case e: java.io.IOException =>
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"[graft] could not delete superseded checkpoint $p: ${e.getMessage}")
          }
        }
        prevFile = Some(newFile)
      }
      out
    }
  }

  /** A fresh retention chain (see [[Chain]]). */
  def chain(): Chain = new Chain()

  /** The reliable-checkpoint directory backing `df`, when `df` is the
    * result of an eager reliable [[cut]] (a bare LogicalRDD over a
    * reliably-checkpointed RDD). Reflection keeps this independent of
    * LogicalRDD's `private[sql]` visibility; any mismatch degrades to
    * None (chain keeps everything — safe, never wrong).
    */
  private def checkpointFileOf(df: DataFrame): Option[String] =
    try {
      val plan = df.queryExecution.analyzed
      if (plan.getClass.getSimpleName != "LogicalRDD") None
      else {
        val m = plan.getClass.getMethod("rdd")
        m.setAccessible(true)
        m.invoke(plan).asInstanceOf[org.apache.spark.rdd.RDD[_]].getCheckpointFile
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
