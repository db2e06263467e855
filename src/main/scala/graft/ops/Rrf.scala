package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack et al., SIGIR 2009) — the standard
  * way to combine heterogeneous retrieval runs (lexical BM25 + embedding
  * ANN being THE hybrid-search pairing) without score calibration:
  * each run contributes `1 / (rrfK + rank)` per (query, doc), summed
  * across runs, and docs re-rank by the fused score. Only RANKS cross
  * runs, so incomparable score scales (scaled-long BM25 vs float cosine)
  * fuse cleanly.
  *
  * Integer discipline: the contribution is `1e9 div (rrfK + rank)` in
  * LONG integer division — no floats anywhere, so fused scores and the
  * output ranking reproduce exactly in any SQL engine (`//` in DuckDB).
  *
  * Scale shape: each run is already top-k-per-query (bounded), so the
  * union is k·runs rows per query; one hash aggregate on (query, doc)
  * and one per-query window over ≤ k·runs rows. No join against corpus
  * data — fusion cost is independent of corpus size.
  */
object Rrf {

  /** Fuse ranked runs. Every frame in `runs` needs (qidCol, idCol,
    * rankCol) with rank 1-based. Output: (qidCol, rank, idCol,
    * scaled_rrf, n_runs) with rank 1..topK per query by (fused score
    * desc, idCol asc); `n_runs` = how many runs retrieved the doc.
    */
  def fuse(
      runs: Seq[DataFrame],
      qidCol: String,
      idCol: String,
      rankCol: String = "rank",
      rrfK: Int = 60,
      topK: Int = 10): DataFrame = {
    require(runs.nonEmpty, "need at least one run")
    require(rrfK >= 0, s"rrfK must be >= 0, got $rrfK")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val contrib = expr(s"1000000000L div ($rrfK + `$rankCol`)")
    val tagged = runs.map(_.select(
      col(qidCol), col(idCol), contrib.as("__c")))
    val w = Window.partitionBy(qidCol)
      .orderBy(col("scaled_rrf").desc, col(idCol).asc)
    tagged.reduce(_ unionByName _)
      .groupBy(qidCol, idCol)
      .agg(sum("__c").as("scaled_rrf"), count(lit(1)).as("n_runs"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col(qidCol), col("rank"), col(idCol), col("scaled_rrf"),
        col("n_runs"))
  }
}
