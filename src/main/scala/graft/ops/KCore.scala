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
    // then both orientations so degree = COUNT over src side. The second
    // orientation is ONE explode pass (two struct rows per pair), not a
    // self-union that would re-execute the whole distinct subtree twice
    // (guide §2.3); the generation is persisted HASH-PARTITIONED BY u so
    // each round's degree aggregate and u-side semi-join reuse the
    // persisted partitioning with no exchange (guide §2.4). Non-integer
    // session widths (e.g. `auto`) skip the explicit partitioning.
    val width = edges.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "").toIntOption
    def byU(df: DataFrame): DataFrame =
      width.fold(df)(w => df.repartition(w, col("u")))
    val und = edges
      .select(col(srcCol).cast("string").as("u"), col(dstCol).cast("string").as("v"))
      .na.drop().filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
    var adj = byU(und.select(explode(array(
        struct(col("u").as("u"), col("v").as("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var nEdges = adj.count()
    var converged = false
    var r = 0
    while (r < rounds && !converged) {
      val keep = adj.groupBy("u").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("u").as("__keep"))
      // v-side semi-join FIRST, u-side LAST: the round's output is then
      // partitioned by u again (the last join's key), so the next round's
      // degree aggregate and u-join stay exchange-free — same row set
      // either way (conjunction of the two endpoint filters)
      val next = adj
        .join(keep, col("v") === col("__keep"), "left_semi")
        .join(keep, col("u") === col("__keep"), "left_semi")
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
