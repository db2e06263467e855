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
    // scale-adaptive round width: each round's shuffles are sized from the
    // MEASURED edge count of the previous generation (which the fused
    // convergence metrics deliver for free), capped at the session width —
    // never raised. A near-converged component graph is a few rows per
    // component; running its groupBy/join/distinct at the cluster-sized
    // session width spends more on task launch than on data (guide §2.2
    // "fewer, larger partitions"), while at corpus scale the count/target
    // quotient lands back at the session width. Non-integer session values
    // (e.g. `auto`) skip the explicit widths entirely.
    val confW = edges.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "").toIntOption
    def widthFor(n: Long): Option[Int] = confW.map(cw =>
      math.max(1L, math.min(cw.toLong, n / EdgeRowsPerShufflePartition + 1)).toInt)
    val (e0, cs0) = chain.cutObserved(edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct(), checksumCols)
    var e = e0
    var prev = (cs0("n").asInstanceOf[Long], cs0("h").asInstanceOf[Long])
    var w = widthFor(prev._1)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // convergence is measured IN the cut's materializing action
      // ([[Lineage.Chain.cutObserved]]): one action per round, not two
      val (e2, cs) = chain.cutObserved(smallStar(largeStar(e, w), w), checksumCols)
      e = e2
      val cur = (cs("n").asInstanceOf[Long], cs("h").asInstanceOf[Long])
      converged = cur == prev
      prev = cur
      w = widthFor(cur._1)
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // At the fixpoint every edge points from a member to its component min
    // (a star, v < u): members label themselves min(v) over their edges,
    // and roots appear only on the v side and label themselves. Both fall
    // out of ONE explode + ONE min aggregate — each edge emits
    // (u, comp=v) for the member and (v, comp=v) for the root; a member's
    // v-side self-mark can never undercut its true min because v < u on
    // every fixpoint edge. This replaces the former members ∪
    // (v-distinct ⋈anti u-distinct) readout: 1 exchange instead of 4 plus
    // a sort-merge anti-join, in the plan of EVERY downstream consumer.
    val marks = e.select(explode(array(
        struct(col("u").as("node"), col("v").as("comp")),
        struct(col("v").as("node"), col("v").as("comp")))).as("p"))
      .select(col("p.node").as("node"), col("p.comp").as("comp"))
    rep(marks, w, col("node"))
      .groupBy("node").agg(min("comp").as("component"))
  }

  /** Rows per round-internal shuffle partition (guide §2.2: partitions in
    * the 100 MB-1 GB band; an edge row is two longs, ~25 B shuffled, so
    * 4 Mi rows ≈ 100 MB).
    */
  private val EdgeRowsPerShufflePartition: Long = 4L << 20

  /** Explicit exchange at the round width (see [[connectedComponents]]);
    * every downstream groupBy/distinct keyed on a superset of `cols`
    * reuses it instead of shuffling at the session width.
    */
  private def rep(df: DataFrame, w: Option[Int],
      cols: org.apache.spark.sql.Column*): DataFrame =
    w.map(df.repartition(_, cols: _*)).getOrElse(df)

  /** Attach group metadata to a component assignment: size and canonical id
    * per group, one row per grouped doc.
    */
  def dupGroups(components: DataFrame): DataFrame =
    components.groupBy("component")
      .agg(count(lit(1)).as("group_size"), collect_list("node").as("members"))

  /** large-star: every node connects its LARGER neighbors to the minimum of
    * its neighborhood (incl. itself) — long chains contract toward small
    * ids geometrically. The symmetric orientation is ONE explode pass (two
    * struct rows per edge), not a self-union that would scan the
    * generation's checkpoint twice (guide §2.3).
    */
  private def largeStar(e: DataFrame, w: Option[Int]): DataFrame = {
    val sym = rep(e.select(explode(array(
        struct(col("u").as("u"), col("v").as("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v")), w, col("u"))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
    rep(sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), least(col("u"), col("mn")).as("v"))
      .filter(col("u") =!= col("v")), w, col("u"), col("v"))
      .distinct()
  }

  /** small-star: every node connects its SMALLER-or-equal neighbors (and
    * itself) to the minimum among them — flattens partial stars.
    */
  private def smallStar(e: DataFrame, w: Option[Int]): DataFrame = {
    val dir = rep(e.select(
      greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v")), w, col("u"))
    val mins = dir.groupBy("u").agg(min("v").as("mn"))
    rep(dir.join(mins, "u")
      .select(col("v").as("u"), col("mn").as("v"))
      .union(mins.select(col("u"), col("mn").as("v")))
      .filter(col("u") =!= col("v")), w, col("u"), col("v"))
      .distinct()
  }

  /** Order-insensitive edge-set fingerprint: (count, xor of row hashes) —
    * xor is overflow-free under ANSI mode and commutative. A collision
    * across rounds would need two DIFFERENT edge sets with equal count and
    * equal hash xor (~2^-64); maxIter backstops even that. Observed inside
    * the cut's materializing action ([[Lineage.Chain.cutObserved]]).
    */
  private def checksumCols: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n"),
    coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h"))
}
