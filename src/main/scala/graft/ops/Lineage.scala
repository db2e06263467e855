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
}
