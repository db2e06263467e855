package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Lineage.CutSyntax

/** Synchronous label propagation — community detection for link graphs
  * (the lightweight complement to [[PageRank]]/[[DupGroups]]/
  * [[Triangles]] in the graph family): every node starts as its own
  * label; each round every node adopts the most frequent label among its
  * neighbors, ties broken by the SMALLEST label. Synchronous rounds +
  * total tie order make the round-k assignment fully deterministic, so
  * any SQL engine reproduces it bit-for-bit (the q_label_prop oracle
  * unrolls the rounds as CTEs).
  *
  * Scale shape per round: one edge⋈labels equi-join (shuffle on the
  * node key), one (node, label) hash aggregate with map-side partials,
  * one `min_by` per node — never adjacency lists in driver memory, no
  * per-node iteration. Lineage is cut eagerly ([[Lineage.cut]]) at
  * the end (iterations are few; PageRank's per-round persist protocol is
  * overkill here).
  */
object LabelPropagation {

  /** (node, label) after `iterations` synchronous rounds over the
    * undirected simple graph of `edges` (self-loops dropped, duplicates
    * collapsed; isolated nodes never appear — they keep their own label
    * trivially).
    */
  def run(edges: DataFrame, src: String, dst: String, iterations: Int): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val und = edges.filter(col(src) =!= col(dst))
      .select(least(col(src), col(dst)).as("u"), greatest(col(src), col(dst)).as("v"))
      .distinct()
    val adj = und.union(und.select(col("v").as("u"), col("u").as("v"))).persist()
    var labels = adj.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 0 until iterations) {
      val neigh = adj.join(labels, adj("v") === labels("node"))
        .select(adj("u").as("node"), col("label"))
      labels = neigh.groupBy("node", "label")
        .agg(count(lit(1)).as("n"))
        .groupBy("node")
        // min over (-n, label): highest count first, then smallest label
        .agg(expr("min_by(label, struct(-n, label))").as("label"))
    }
    val out = labels.cutLineage()
    adj.unpersist()
    out
  }
}
