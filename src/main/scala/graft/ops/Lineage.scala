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
  *    live generation per operator. [[cut]] warns ONCE per JVM when it
  *    selects reliable (whether `auto` picked it merely because
  *    `setCheckpointDir` was called for unrelated RDD work, or the
  *    caller asked for `reliable` explicitly — the hazard is the same)
  *    while that cleaner conf is false — an iterative job would
  *    otherwise grow the checkpoint directory without bound and nothing
  *    would ever say so. Chain-managed cuts are exempt: a [[Chain]]
  *    deletes superseded generations itself, deterministically, and
  *    instead warns if it ever LOSES the ability to do so
  *    ([[warnIfChainLostCheckpoint]]).
  *
  * [[graft.SparkEntry]]'s query-local materializations deliberately stay
  * on `localCheckpoint`: they are one-shot single-session demos where a
  * lost block fails one rerunnable query, not an hours-long iterative
  * job.
  */
private[graft] object Lineage {

  /** Once-per-JVM latch for the unbounded-checkpoint-dir warning
    * (object doc, reliable-mode mechanics). */
  private val warnedAutoRetention = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Whether [[cut]] will select a RELIABLE checkpoint for this session
    * (the object-doc dispatch), validating the conf loudly either way. */
  private def reliableSelected(session: org.apache.spark.sql.SparkSession): Boolean = {
    val mode = session.conf.get("spark.graft.checkpoint", "auto")
    mode match {
      case "reliable" => true
      case "local"    => false
      case "auto"     => session.sparkContext.getCheckpointDir.isDefined
      case other => throw new IllegalArgumentException(
        s"spark.graft.checkpoint must be auto, reliable or local, got '$other'")
    }
  }

  /** Materialize `df` eagerly and cut its lineage (see object doc for
    * the local-vs-reliable dispatch).
    */
  def cut(df: DataFrame): DataFrame = cutInternal(df, viaChain = false)

  private def cutInternal(df: DataFrame, viaChain: Boolean): DataFrame = {
    val session = df.sparkSession
    val reliable = reliableSelected(session)
    // unbounded-retention warning: fires for BOTH auto-selected and
    // explicitly-requested reliable mode (r16 — the hazard is identical;
    // before r16 only auto warned), but NOT for chain-managed cuts —
    // a Chain deletes superseded generations itself, deterministically,
    // regardless of the cleaner conf.
    if (reliable && !viaChain &&
        !session.sparkContext.getConf
          .getBoolean("spark.cleaner.referenceTracking.cleanCheckpoints", defaultValue = false) &&
        warnedAutoRetention.compareAndSet(false, true)) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "[graft] lineage cuts use RELIABLE checkpoints " +
          s"(spark.graft.checkpoint=${session.conf.get("spark.graft.checkpoint", "auto")}), " +
          "but spark.cleaner.referenceTracking.cleanCheckpoints is false: Spark " +
          "never deletes checkpoint files, so iterative operators grow the " +
          "checkpoint directory without bound. Set that conf to true (GC then " +
          "bounds the dir at ~one live generation per operator) or set " +
          "spark.graft.checkpoint=local to keep zero-I/O local cuts.")
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
    * it). Wired into every in-operator loop that cuts MORE THAN ONCE
    * per call: [[DupGroups.connectedComponents]] and both [[Bpe]]
    * trainers. [[KCore]], [[Bfs]], and [[LabelPropagation]] deliberately
    * have NO chain: each call makes exactly ONE final cut, whose
    * checkpoint backs the returned frame — there is never a superseded
    * generation to delete inside the call, and deleting across CALLS
    * would destroy results earlier callers still hold (callers who
    * batch-iterate such ops own the retention of the frames they keep).
    * `chain.cut(df)` behaves exactly like
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
  /** Once-per-JVM latch: a RELIABLE-mode chain cut whose checkpoint file
    * could not be identified (reflection miss — see [[checkpointFileOf]])
    * silently degrades to keep-everything, which is exactly the
    * unbounded-retention hazard chains exist to fix — production must
    * hear about it once (LineageSpec catches a Spark-upgrade breakage at
    * test time; this covers a production Spark the tests never saw). */
  private val warnedChainLostCheckpoint = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Warn (once per JVM) iff a reliable-mode chain cut failed to
    * identify its checkpoint file; returns whether THIS call warned —
    * split out pure-decision-shaped so the spec can pin the condition
    * without forcing a real reflection miss. */
  private[graft] def warnIfChainLostCheckpoint(
      reliable: Boolean, checkpointFile: Option[String]): Boolean = {
    val fire = reliable && checkpointFile.isEmpty &&
      warnedChainLostCheckpoint.compareAndSet(false, true)
    if (fire) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "[graft] a reliable-mode chain cut could not identify its checkpoint " +
          "file (LogicalRDD reflection mismatch — Spark version drift?): " +
          "superseded generations will NOT be deleted, silently restoring the " +
          "unbounded checkpoint-directory retention chains exist to prevent. " +
          "Set spark.cleaner.referenceTracking.cleanCheckpoints=true as a " +
          "GC-driven fallback bound, or pin a Spark version LineageSpec covers.")
    }
    fire
  }

  final class Chain private[Lineage] () {
    private var prevFile: Option[String] = None

    /** [[cut]] that ADDITIONALLY returns aggregate `metrics` of the same
      * materializing action, via `Dataset.observe`: a CollectMetrics node
      * rides the plan the eager cut executes, so a generational loop's
      * convergence measurement (count/checksum of the new generation)
      * costs ZERO extra actions — the separate per-round aggregate job it
      * replaces was, at small-graph bench scale, as expensive as the
      * round itself (r16 verdict item 1). Blocks until the observed row
      * is delivered (the listener bus is async; the eager cut guarantees
      * the action has run, so the wait is milliseconds).
      *
      * Contract: `metrics` must be aggregate expressions per the observe
      * contract (no distinct aggregates, deterministic inputs). On a real
      * cluster a speculative or re-attempted task can double-count into
      * an observed metric (accumulator semantics) — callers must use the
      * metrics only to GATE convergence (a perturbed round reads as
      * "changed", costing at most one extra round), never as a result.
      */
    def cutObserved(df: DataFrame, metrics: Seq[org.apache.spark.sql.Column])
        : (DataFrame, Map[String, Any]) = {
      require(metrics.nonEmpty, "cutObserved needs at least one metric")
      val obs = org.apache.spark.sql.Observation()
      val out = cut(df.observe(obs, metrics.head, metrics.tail: _*))
      (out, obs.get)
    }

    def cut(df: DataFrame): DataFrame = {
      val reliable = reliableSelected(df.sparkSession)
      val out = Lineage.cutInternal(df, viaChain = true)
      val newFileOpt = checkpointFileOf(out)
      warnIfChainLostCheckpoint(reliable, newFileOpt)
      newFileOpt.foreach { newFile =>
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
    * None — chain keeps everything (safe, never wrong) and says so once
    * ([[warnIfChainLostCheckpoint]]), because in reliable mode a silent
    * None is the unbounded-retention hazard coming back.
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
