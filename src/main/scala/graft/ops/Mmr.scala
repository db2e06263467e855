package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosineSimilarity

/** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998) —
  * diversified re-ranking of a retrieval shortlist: greedily pick the
  * candidate maximizing `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`,
  * so near-duplicates of an already-selected result are demoted. The
  * standard second stage after ANN retrieval when the shortlist is
  * redundant (mirror pages, boilerplate variants).
  *
  * Determinism: scores are doubles, but both factors come from the same
  * codegen [[graft.functions.CosineSimilarity]] (sequential sum — the
  * IEEE op order DuckDB's `list_cosine_similarity` mirrors), the
  * `λ·rel − (1−λ)·sim` combination is the identical multiply-multiply-
  * subtract on both engines, and every argmax tie-breaks by candidate
  * id — so the pick sequence reproduces exactly cross-engine.
  *
  * Scale shape: MMR runs AFTER retrieval, on a bounded per-query
  * shortlist (k·candidates rows per query, never the corpus). Each of
  * the k rounds is one join of the shortlist against the selected set
  * (≤ step rows per query) + one max-aggregate + one per-query argmax
  * window — all on shortlist-sized frames; cost is independent of
  * corpus size by construction.
  */
object Mmr {

  /** Diversify a shortlist. `candidates` needs (qidCol, idCol, relCol,
    * vecCol: array&lt;double&gt;); relevance is "bigger = better" (e.g.
    * cosine to the query). Returns (qidCol, step, idCol) with step
    * 1..k in pick order. Step 1 is pure relevance (empty selected set).
    */
  def diversify(
      candidates: DataFrame,
      qidCol: String,
      idCol: String,
      relCol: String,
      vecCol: String,
      k: Int,
      lambda: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    // Materialize the shortlist ONCE (localCheckpoint): every round's
    // scoring join, argmax, and anti-join referenced `candidates`
    // repeatedly — with an expensive retrieval subtree feeding it, the
    // unmaterialized loop re-derived that subtree ~(4k+1) times (q_mmr's
    // before plan scanned the embeddings corpus 39x for k=3). The
    // shortlist is bounded per the operator contract (k·candidates rows
    // per query, never the corpus), so the checkpoint is always small.
    val base = candidates.select(col(qidCol).as("__q"), col(idCol).as("__id"),
      col(relCol).as("__rel"), col(vecCol).as("__v"))
      .localCheckpoint(true)
    val argmax = Window.partitionBy("__q")
      .orderBy(col("__score").desc, col("__id").asc)
    var selected: DataFrame = null // accumulated (q, step, id, vec)
    var remaining = base
    for (step <- 1 to k) {
      val scored =
        if (selected == null) remaining.withColumn("__score", lit(lambda) * col("__rel"))
        else {
          val sel = selected.select(col("__q").as("__sq"), col("__v").as("__sv"))
          remaining.join(sel, col("__q") === col("__sq"))
            .withColumn("__sim", cosineSimilarity(col("__v"), col("__sv")))
            .groupBy("__q", "__id")
            .agg(first("__rel").as("__rel"), first("__v").as("__v"),
              max("__sim").as("__maxsim"))
            .withColumn("__score",
              lit(lambda) * col("__rel") - lit(1 - lambda) * col("__maxsim"))
        }
      // one row per query: checkpoint eagerly so `selected` (read by every
      // later round's scoring join) and the anti-join don't re-run this
      // round's argmax — keeps plan depth constant across rounds
      val pick = scored.withColumn("__rn", row_number().over(argmax))
        .filter(col("__rn") === 1)
        .select(col("__q"), lit(step.toLong).as("step"), col("__id"), col("__v"))
        .localCheckpoint(true)
      selected = if (selected == null) pick else selected.unionByName(pick)
      remaining = remaining.join(
        pick.select(col("__q").as("__pq"), col("__id").as("__pid")),
        col("__q") === col("__pq") && col("__id") === col("__pid"),
        "left_anti")
    }
    selected.select(col("__q").as(qidCol), col("step"), col("__id").as(idCol))
  }
}
