package graft.ops

import org.apache.spark.sql.DataFrame

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
  *
  * [[graft.SparkEntry]]'s query-local materializations deliberately stay
  * on `localCheckpoint`: they are one-shot single-session demos where a
  * lost block fails one rerunnable query, not an hours-long iterative
  * job.
  */
private[graft] object Lineage {

  /** Materialize `df` eagerly and cut its lineage (see object doc for
    * the local-vs-reliable dispatch).
    */
  def cut(df: DataFrame): DataFrame = {
    val session = df.sparkSession
    val reliable = session.conf.get("spark.graft.checkpoint", "auto") match {
      case "reliable" => true
      case "local"    => false
      case _          => session.sparkContext.getCheckpointDir.isDefined
    }
    if (reliable) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
  }

  /** `.cutLineage()` postfix syntax so call sites read like the
    * `.localCheckpoint(true)` chains they replace.
    */
  implicit class CutSyntax(private val df: DataFrame) extends AnyVal {
    def cutLineage(): DataFrame = cut(df)
  }
}
