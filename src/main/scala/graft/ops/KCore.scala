package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.Lineage.CutSyntax

/** k-core peeling over an undirected graph: repeatedly delete nodes of
  * degree < k; what survives `rounds` rounds is the (partial) k-core —
  * the standard "dense-cohesion" filter for link graphs (spam farms and
  * genuine hub communities survive; sparse tendrils peel away). A fixed
  * round count makes the result a PURE function of (graph, k, rounds):
  * engines that unroll the same recurrence agree bit-for-bit even before
  * the fixpoint, and the returned flag says whether the peel already
  * converged (at scale, callers iterate in checkpointed batches of
  * rounds until it does).
  *
  * Each round is one degree aggregate + one semi-join of the edge list
  * against surviving nodes per endpoint — all plain shuffled hash
  * operations, nothing driver-sized; edges are persisted per generation
  * and released one generation deep (the [[PageRank]] discipline).
  */
object KCore {

  /** @param edges undirected edge list (each pair in either orientation;
    *              duplicates and self-loops are cleaned: degree counts
    *              DISTINCT neighbors, self-loops contribute nothing)
    * @return (surviving nodes as `(node, degree)` — degree WITHIN the
    *         surviving subgraph, converged?)
    */
  def peel(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      rounds: Int): (DataFrame, Boolean) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // canonical undirected adjacency: distinct unordered pairs, no loops,
    // then both orientations so degree = COUNT over src side
    val und = edges
      .select(col(srcCol).cast("string").as("u"), col(dstCol).cast("string").as("v"))
      .na.drop().filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
    var adj = und.select(col("u"), col("v"))
      .union(und.select(col("v").as("u"), col("u").as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var nEdges = adj.count()
    var converged = false
    var r = 0
    while (r < rounds && !converged) {
      val keep = adj.groupBy("u").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("u").as("__keep"))
      val next = adj
        .join(keep, col("u") === col("__keep"), "left_semi")
        .join(keep, col("v") === col("__keep"), "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = next.count()
      adj.unpersist(blocking = false)
      adj = next
      converged = n == nEdges
      nEdges = n
      r += 1
    }
    val out = adj.groupBy(col("u").as("node")).agg(count(lit(1)).as("degree"))
      .cutLineage()
    adj.unpersist(blocking = false)
    (out, converged)
  }
}
