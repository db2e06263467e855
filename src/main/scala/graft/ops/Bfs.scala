package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.Lineage.CutSyntax

/** Multi-source breadth-first search: exact hop distance from a seed set
  * along DIRECTED edges, bounded depth — link-distance-from-trusted-hosts
  * is the classic web-corpus quality prior next to [[PageRank]] (it is
  * the "hop count from seed list" feature in spam-demotion stacks).
  *
  * Iteration is frontier expansion, the only BFS shape that scales: each
  * round is ONE equi-join of the current frontier against the edge list
  * (shuffle hash join on src — the frontier is data-sized in the worst
  * round, so nothing is broadcast) + ONE anti-join against the visited
  * set to keep only first discoveries. Rounds are bounded by `maxHops`
  * and terminate early when a frontier empties; per round exactly one
  * job runs and one driver scalar (the frontier count) is collected.
  * Each round's generation is persisted once, and the visited set is the
  * union of those persisted generations — re-unioning cached frames per
  * round instead of re-materializing the whole visited set, with lineage
  * depth bounded by `maxHops`.
  *
  * Distances are exact, not approximate: a node's hop is the FIRST round
  * that reached it (the anti-join guarantees min-hop), identical to the
  * sequential BFS result regardless of partitioning.
  */
object Bfs {

  /** @param seeds one column `seedCol` of start nodes (hop 0); seeds
    *              absent from the graph still appear at hop 0
    * @return `(node, hop)` for every node within `maxHops` directed hops
    *         of any seed; unreachable nodes are absent
    */
  def hops(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    // (pre-partitioning e by __src for exchange-free frontier joins was
    // measured and rejected in r17 — see the PageRank.cleanEdges note: at
    // bench scale the frontier join is broadcast, so the repartition only
    // added an exchange; q_bfs_hops read 1.07x against flat controls)
    val e = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .na.drop().distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // visited is the union of per-round generations, each persisted once
    // when it was the frontier — no per-round re-materialization of the
    // whole visited set; lineage depth is bounded by maxHops (a small
    // constant), and exactly ONE job runs per round (the frontier count)
    val gens = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    gens += seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("hop", lit(0L))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def visited: DataFrame = gens.reduce(_ union _)
    var h = 1
    var exhausted = gens.head.count() == 0
    while (h <= maxHops && !exhausted) {
      val next = gens.last
        .join(e, col("node") === col("__src"))
        .select(col("__dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("hop", lit(h.toLong))
        .persist(StorageLevel.MEMORY_AND_DISK)
      exhausted = next.count() == 0
      if (!exhausted) gens += next
      else next.unpersist(blocking = false)
      h += 1
    }
    // snapshot the node-sized result off the persisted lineage, then drop
    // every generation
    val out = visited.cutLineage()
    gens.foreach(_.unpersist(blocking = false))
    e.unpersist(blocking = false)
    out
  }
}
