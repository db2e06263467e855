package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers (SURVEY.md north-star "similarity search"):
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the full corpus; one scan, no corpus shuffle. This is the
  *    correctness baseline and is already the right plan when |queries| is
  *    small: at 100 TB the corpus is scanned once, map-side, and only
  *    |queries| x k rows survive the per-partition top-k before the final
  *    window.
  *  - [[lshTopK]]: sign-LSH (random hyperplanes) bucketing — corpus and
  *    queries are bucketed by `nPlanes` hyperplane signs across `tables`
  *    independent tables; only same-bucket pairs are scored. Recall is
  *    tuned by (nPlanes, tables); candidates shrink by ~2^nPlanes.
  */
object Similarity {

  /** Exact cosine top-k of `corpus` for each row of `queries` (both need
    * `idCol` + `vecCol`). Returns (query_id, rank, neighbor_id, cosine).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), toDoubleArray(col(vecCol)).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("__qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineSimilarity(col("__cv"), col("__qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Approximate top-k: OR-amplified sign-LSH. Each of `tables` hash tables
    * buckets vectors by an `nPlanes`-bit signature; a corpus vector is a
    * candidate for a query if they share a bucket in ANY table. Candidates
    * are then exactly scored and top-k'd — same output shape as brute force.
    *
    * SINGLE-PASS bucketing: all `tables` bucket ids are computed in one
    * [[graft.functions.LshBuckets]] codegen expression and `posexplode`d to
    * (table, bucket) rows, so the corpus is scanned ONCE and joined ONCE on
    * (table, bucket) — the earlier per-table union re-scanned the corpus
    * `tables` times, the dominant avoidable cost of this operator at 100 TB.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      nPlanes: Int = 8,
      tables: Int = 4,
      seed: Long = 7L): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), toDoubleArray(col(vecCol)).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("__qv"))
    // a wrong `dim` would mark EVERY vector malformed (bucket -1) and
    // silently return an empty result — probe a small sample and fail
    // loudly only when NO sampled row matches (one tiny job, negligible
    // next to the scan it guards). A single malformed row must NOT fail
    // the query: the bucket=-1 path exists precisely to tolerate and drop
    // those, so the guard can't be first-row-sensitive.
    // null vectors size to null — skip them like any other malformed row
    val probe = c.select(size(col("__cv")).as("__d")).head(16)
    if (probe.nonEmpty && !probe.exists(r => !r.isNullAt(0) && r.getInt(0) == dim)) {
      val seen = probe.map(r => if (r.isNullAt(0)) "null" else r.getInt(0).toString)
        .distinct.sorted.mkString(",")
      throw new IllegalArgumentException(
        s"lshTopK: dim=$dim but none of ${probe.length} sampled corpus vectors match (saw sizes: $seen)")
    }
    // same plane tensor the per-table formulation used: table t = seed + t
    val planes = (0 until tables).map(t => hyperplanes(seed + t, nPlanes, dim)).toArray

    // bucket -1 marks malformed vectors (wrong dim / null element) — drop
    // those rows so they candidate with nothing, not with each other
    def bucketRows(df: DataFrame, vec: String) = df.select(col("*"),
      posexplode(graft.functions.LshBuckets(col(vec), planes)).as(Seq("__t", "__bucket")))
      .filter(col("__bucket") =!= -1)

    val bucketed = bucketRows(c, "__cv")
      .join(broadcast(bucketRows(q, "__qv")), Seq("__t", "__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "__cv", "__qv")

    val candidates = bucketed.dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosineSimilarity(col("__cv"), col("__qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Two-stage retrieval finish: EXACT cosine re-ranking of an ANN
    * candidate set — the standard production pattern (cheap approximate
    * recall stage → exact precision stage over the survivors).
    * `candidates` is (query_id, neighbor_id) from any ANN stage
    * ([[lshTopK]], `Pq.adcSearch`, `Pq.ivfPqSearch`); the vectors are
    * re-attached from the corpus/query frames, never recomputed from the
    * ANN's quantized codes. Returns (query_id, rank, neighbor_id,
    * cosine) with rank by exact cosine desc, id tiebreak.
    *
    * Scale shape: the candidate set is |queries| · k' rows — bounded by
    * the query batch, NOT the corpus — so it BROADCASTS into one corpus
    * equi-join to attach neighbor vectors (the corpus is scanned once
    * and filtered scan-side by the broadcast hash); query vectors attach
    * from a second bounded broadcast. No all-pairs term anywhere.
    */
  def rerankExact(
      candidates: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // dedup defensively: a pre-dedup multi-table LSH candidate set would
    // otherwise emit the same neighbor at consecutive ranks, pushing a
    // genuine top-k neighbor out of the cut
    val cand = candidates.select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val c = corpus.select(col(idCol).as("neighbor_id"), toDoubleArray(col(vecCol)).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("__qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", cosineSimilarity(col("__cv"), col("__qv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Hard-negative mining for contrastive embedding training: for each
    * anchor, the top-k most-similar corpus vectors with a DIFFERENT
    * label — the negatives that actually move a contrastive loss —
    * excluding candidates with cosine >= `maxCosine` (near-identical
    * vectors across labels are overwhelmingly label noise / undetected
    * duplicates, the known false-negative trap of naive mining).
    *
    * Same plan shape as [[bruteForceTopK]]: the bounded anchor batch
    * broadcasts against one corpus scan (label filter applied in the
    * join condition, so same-label pairs never materialize), then a
    * per-anchor top-k window over the surviving rows. Output:
    * (anchor_id, rank, negative_id, neg_label).
    */
  def hardNegatives(
      corpus: DataFrame,
      anchors: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      maxCosine: Double = 0.99): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val c = corpus.select(col(idCol).as("negative_id"),
      col(labelCol).as("neg_label"), toDoubleArray(col(vecCol)).as("__cv"))
    val a = anchors.select(col(idCol).as("anchor_id"),
      col(labelCol).as("__albl"), toDoubleArray(col(vecCol)).as("__qv"))
    val w = Window.partitionBy("anchor_id")
      .orderBy(col("cosine").desc, col("negative_id").asc)
    c.join(broadcast(a), col("neg_label") =!= col("__albl"))
      .withColumn("cosine", cosineSimilarity(col("__cv"), col("__qv")))
      .filter(col("cosine") < maxCosine)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("anchor_id", "rank", "negative_id", "neg_label")
  }
}
