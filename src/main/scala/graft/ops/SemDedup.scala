package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** SemDeDup-style SEMANTIC deduplication: documents whose EMBEDDINGS are
  * near-identical (cosine >= threshold) are semantic duplicates even when
  * their n-grams differ (paraphrase, re-rendering, template fill) — the
  * dedup stage corpus teams run AFTER MinHash/SimHash, over the same
  * embedding column the similarity-search operators consume.
  *
  * The quadratic all-pairs comparison is tamed the SemDeDup way: compare
  * only WITHIN the cells of the IVF coarse quantizer ([[IvfIndex.train]]).
  * K-means cells follow the density of the embedding space, so
  * near-identical vectors co-locate with high probability, and cross-cell
  * pairs are NEVER scored — an explicit recall trade (a near-dup pair
  * straddling a cell boundary is missed; raise `nLists` resolution or run
  * two clusterings to tighten it), which is what makes the operator
  * linear-ish instead of quadratic at corpus scale.
  *
  * Scale shape: one broadcast-model assignment pass (no shuffle — the
  * centroid matrix rides inside the codegen'd
  * [[graft.functions.NearestCentroids]] expression), then ONE
  * shuffle-equi-join on the cell id. Within a cell the comparison is
  * quadratic by contract: size `nLists` so cells stay bounded
  * (~corpus/nLists vectors), and `maxCellSize` drops degenerate cells (a
  * logged coverage bound, the LSH `maxBucketSize` trade).
  */
object SemDedup {

  /** (cell, idA, idB, cosine) for same-cell pairs with cosine >=
    * `threshold`, idA < idB, each pair exactly once (a vector has exactly
    * one cell, so no dedup pass is needed).
    */
  def withinCellPairs(
      model: IvfIndex.Model,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      maxCellSize: Long = Long.MaxValue): DataFrame =
    cellPairs(model, corpus, idCol, vecCol, threshold, None, maxCellSize)
      .select("cell", "idA", "idB", "cosine")

  /** Semantic dedup: drop every row that LOSES a qualifying within-cell
    * pair. The keeper of a pair is the higher `(score, -id)` — highest
    * quality first, minimum id on ties — so transitive chains collapse
    * toward the cell's best representative; with the default constant
    * score this is [[Dedup.nearDedup]]'s min-id rule on the embedding
    * space. `score` must be computable from `corpus`'s columns and
    * engine-exact if the result is oracle-compared (the
    * [[Dedup.keepBest]] caveat).
    */
  def semanticDedup(
      model: IvfIndex.Model,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      score: Column = lit(0L),
      maxCellSize: Long = Long.MaxValue): DataFrame = {
    val pairs = cellPairs(model, corpus, idCol, vecCol, threshold, Some(score), maxCellSize)
    // loser = lesser (score, -id) struct; distinct ids, then one anti-join.
    // The loser set is one id per dropped row — eagerly materialized the
    // way nearDedup does NOT need here: the plan stays lazy, ids only.
    val losers = pairs
      .select(when(
        struct(col("__sa"), (-col("idA").cast("long")).as("__n")) <
          struct(col("__sb"), (-col("idB").cast("long")).as("__n")),
        col("idA")).otherwise(col("idB")).as("__loser"))
      .distinct()
    corpus.join(losers, col(idCol) === col("__loser"), "left_anti")
  }

  /** Cross-set SEMANTIC contamination — embedding-space eval-set leakage,
    * the fuzzy-decontamination analog ([[Decontaminate]]) one
    * representation up: corpus vectors near-identical (cosine >=
    * `threshold`) to an EVAL-set vector are flagged, comparing only
    * within the shared IVF cell (same recall trade as [[withinCellPairs]]
    * — a pair straddling a cell boundary is missed). Corpus x corpus and
    * eval x eval pairs are NEVER generated; the eval side is bounded by
    * the benchmark suite, so it broadcasts pinned (the [[Decontaminate]]
    * eval-set precedent) — the corpus never shuffles by cell for this.
    * Output: (cell, corpus_id, carryCols…, eval_id, cosine), one row per
    * qualifying cross pair. `maxCellSize` bounds the CORPUS side of a
    * cell (logged coverage bound); the eval side is never dropped.
    */
  def crossSetPairs(
      model: IvfIndex.Model,
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      carryCols: Seq[String] = Nil,
      maxCellSize: Long = Long.MaxValue): DataFrame = {
    require(threshold >= -1 && threshold <= 1, s"threshold must be in [-1,1], got $threshold")
    require(maxCellSize > 0, s"maxCellSize must be positive, got $maxCellSize")
    val corpusAssigned = IvfIndex.withCell(
      Dedup.spreadDf(corpus).select(col(idCol).as("corpus_id") +:
        carryCols.map(col) :+ toDoubleArray(col(vecCol)).as("__vc"): _*),
      "__vc", model)
    val capped = dropOversizedCells(corpusAssigned, maxCellSize, "crossSetPairs")
    val evalAssigned = IvfIndex.withCell(
      evalSet.select(col(idCol).as("eval_id"),
        toDoubleArray(col(vecCol)).as("__ve")),
      "__ve", model)
    capped.join(broadcast(evalAssigned), Seq("cell"))
      .withColumn("cosine", cosineSimilarity(col("__vc"), col("__ve")))
      .filter(col("cosine") >= threshold)
      .select(col("cell") +: col("corpus_id") +: carryCols.map(col) :+
        col("eval_id") :+ col("cosine"): _*)
  }

  /** Sort-free cell-size cap, shared by the within-cell and cross-set
    * paths: hash-agg the oversized cell ids, anti-join them away.
    */
  private def dropOversizedCells(
      assigned: DataFrame, maxCellSize: Long, who: String): DataFrame =
    if (maxCellSize == Long.MaxValue) assigned
    else {
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"SemDedup.$who: coverage bound maxCellSize=$maxCellSize — larger cells are dropped")
      val oversized = assigned.groupBy("cell")
        .agg(count(lit(1)).as("__csize"))
        .filter(col("__csize") > maxCellSize)
        .select("cell")
      assigned.join(oversized, Seq("cell"), "left_anti")
    }

  /** Shared pair pipeline; `scoreCol` rides along as __sa/__sb when the
    * caller needs keep-best resolution.
    */
  private def cellPairs(
      model: IvfIndex.Model,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      scoreCol: Option[Column],
      maxCellSize: Long): DataFrame = {
    require(threshold >= -1 && threshold <= 1, s"threshold must be in [-1,1], got $threshold")
    require(maxCellSize > 0, s"maxCellSize must be positive, got $maxCellSize")
    val base = Dedup.spreadDf(corpus)
      .select(col(idCol).as("__id") +: toDoubleArray(col(vecCol)).as("__v") +:
        scoreCol.map(_.as("__s")).toSeq: _*)
    val assigned = IvfIndex.withCell(base, "__v", model)
    val capped = dropOversizedCells(assigned, maxCellSize, "cellPairs")
    val sel = (suffix: String) =>
      col("cell") +: col("__id").as(s"id$suffix") +: col("__v").as(s"__v$suffix") +:
        scoreCol.map(_ => col("__s").as(s"__s${suffix.toLowerCase}")).toSeq
    val a = capped.select(sel("A"): _*)
    val b = capped.select(sel("B"): _*)
    a.join(b, Seq("cell"))
      .filter(col("idA") < col("idB"))
      .withColumn("cosine", cosineSimilarity(col("__vA"), col("__vB")))
      .filter(col("cosine") >= threshold)
  }
}
