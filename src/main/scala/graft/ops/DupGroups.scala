package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


/** Duplicate-group assembly: candidate/verified near-dup PAIRS (the output
  * of [[Dedup.minhashCandidatePairs]] / [[Dedup.shingleJaccardPairs]]) are
  * only half of a dedup pipeline — transitive chains (A~B, B~C) must
  * collapse into one GROUP with one canonical survivor. That is connected
  * components over the pair graph.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — each round is
  * two groupBy+join passes over the edge list, no driver-side graph state,
  * converging to per-component star graphs in O(log^2 n) rounds (2-4 in
  * practice: near-dup components are cliques and short chains). This is the
  * shape that survives 100 TB: the working set is the EDGE list (pairs,
  * already sparse after LSH blocking + verification), never the corpus, and
  * every pass is a shuffle on node id that AQE can size.
  *
  * Scale notes:
  *  - each iteration cuts the shrinking edge list's lineage
  *    ([[Lineage.cut]] — `localCheckpoint` single-box, reliable
  *    `checkpoint` when a checkpoint dir is configured, surviving
  *    executor loss over the multi-round loop): iterative DataFrame
  *    algorithms otherwise accumulate lineage and re-plan the whole
  *    history every round (analyzer time grows superlinearly). The
  *    handful of checkpointed edge RDDs (one per round, each bounded by
  *    the input pair count and shrinking) is the deliberate cost.
  *  - convergence is detected with a count+hash checksum — one tiny
  *    aggregate per round, no edge-set comparison join.
  */
object DupGroups {

  /** Connected components over an undirected edge list.
    *
    * @return one row per node that appears in `edges`:
    *         (node LONG, component LONG) where `component` is the smallest
    *         node id in that component (the canonical survivor for dedup).
    *         Isolated docs (no edges) are by definition their own group and
    *         are not emitted — callers union them back if needed.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25): DataFrame = {
    // generational retention: round N's edge set fully supersedes round
    // N-1's, so the chain deletes the superseded reliable checkpoint as
    // soon as the next one materializes (O(1) live generations)
    val chain = Lineage.chain()
    var e = chain.cut(edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct())
    var prev = checksum(e)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      e = chain.cut(smallStar(largeStar(e)))
      val cur = checksum(e)
      converged = cur == prev
      prev = cur
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // At the fixpoint every edge points from a member to its component min
    // (a star); roots appear only on the v side and label themselves.
    val members = e.groupBy(col("u").as("node")).agg(min("v").as("component"))
    val roots = e.select(col("v").as("node")).distinct()
      .join(e.select(col("u").as("node")).distinct(), Seq("node"), "left_anti")
      .withColumn("component", col("node"))
    members.unionByName(roots)
  }

  /** Attach group metadata to a component assignment: size and canonical id
    * per group, one row per grouped doc.
    */
  def dupGroups(components: DataFrame): DataFrame =
    components.groupBy("component")
      .agg(count(lit(1)).as("group_size"), collect_list("node").as("members"))

  /** large-star: every node connects its LARGER neighbors to the minimum of
    * its neighborhood (incl. itself) — long chains contract toward small
    * ids geometrically.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), least(col("u"), col("mn")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** small-star: every node connects its SMALLER-or-equal neighbors (and
    * itself) to the minimum among them — flattens partial stars.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val mins = dir.groupBy("u").agg(min("v").as("mn"))
    dir.join(mins, "u")
      .select(col("v").as("u"), col("mn").as("v"))
      .union(mins.select(col("u"), col("mn").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Order-insensitive edge-set fingerprint: (count, xor of row hashes) —
    * xor is overflow-free under ANSI mode and commutative. A collision
    * across rounds would need two DIFFERENT edge sets with equal count and
    * equal hash xor (~2^-64); maxIter backstops even that.
    */
  private def checksum(e: DataFrame): (Long, Long) = {
    val row = e.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h")).head()
    (row.getLong(0), row.getLong(1))
  }
}
