package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: find corpus documents
  * that share at least one `n`-token shingle with an evaluation set (the
  * standard n-gram-overlap test-set-leakage check used before training).
  *
  * Shape: shingle inverted-index join — the corpus explodes to (doc,
  * shingle) once, the (small) eval set broadcasts, and only docs sharing a
  * shingle ever meet. No all-pairs comparison; at 100 TB the corpus side
  * stays a single scan + one distinct-aggregate shuffle on the matched ids.
  */
object Decontaminate {

  /** Distinct ids of corpus docs sharing >= 1 n-token shingle with any
    * OTHER document of the eval set (a doc present in both inputs does not
    * contaminate itself).
    *
    * Joins on 64-bit xxhash of each shingle (the one-pass
    * [[graft.functions.HashedShingles]] codegen expression), not the
    * n-word string: the exploded corpus side carries 8 bytes per shingle
    * instead of ~50-char strings (measured ~4x end-to-end). A cross-doc
    * hash collision (~2^-64 per shingle pair) could flag one spurious doc;
    * acceptable for a leakage screen, and deterministic.
    */
  def contaminated(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    val cs = corpus.select(col(idCol).as("__cid"),
      explode(array_distinct(graft.functions.HashedShingles(col(textCol), n))).as("__s"))
    val es = evalSet.select(col(idCol).as("__eid"),
      explode(array_distinct(graft.functions.HashedShingles(col(textCol), n))).as("__s"))
    cs.join(broadcast(es), Seq("__s"))
      .filter(col("__cid") =!= col("__eid"))
      .select(col("__cid").as(idCol))
      .distinct()
  }

  /** Coverage-fraction decontamination — the FUZZY leakage check: for each
    * (corpus doc, eval item) pair, the fraction of the eval item's
    * DISTINCT n-token shingles that appear in the corpus doc; pairs at
    * `minCoverage` or above are flagged. [[contaminated]] flags on ANY
    * shared shingle; production eval-set screens flag when MOST of an
    * eval item leaks (e.g. >= 80% n-gram coverage), which tolerates a
    * benign single-shingle collision while still catching truncated or
    * lightly-edited copies.
    *
    * Same inverted-index scale shape as [[contaminated]]: the corpus
    * explodes once to hashed (doc, shingle) pairs, the (small by
    * contract) eval side broadcasts, and coverage is one (cid, eid)
    * count aggregate joined to the broadcast per-eval-item sizes —
    * the corpus side is still a single scan + one shuffle keyed by the
    * matched pairs, never all-pairs.
    *
    * Returns (idCol, eval_id, n_shared, n_eval_shingles, coverage),
    * self-pairs excluded.
    */
  def contaminationCoverage(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minCoverage: Double = 0.8): DataFrame = {
    require(minCoverage > 0 && minCoverage <= 1,
      s"minCoverage must be in (0,1], got $minCoverage")
    val cs = corpus.select(col(idCol).as("__cid"),
      explode(array_distinct(graft.functions.HashedShingles(col(textCol), n))).as("__s"))
    val es = evalSet.select(col(idCol).as("__eid"),
      explode(array_distinct(graft.functions.HashedShingles(col(textCol), n))).as("__s"))
    val sizes = es.groupBy("__eid").agg(count(lit(1)).as("__esize"))
    // cs and es are per-doc DISTINCT shingles, so each (cid, eid, s)
    // triple joins at most once and the count IS |intersection|
    cs.join(broadcast(es), Seq("__s"))
      .filter(col("__cid") =!= col("__eid"))
      .groupBy("__cid", "__eid")
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes), Seq("__eid"))
      .withColumn("coverage",
        col("n_shared").cast("double") / col("__esize").cast("double"))
      .filter(col("coverage") >= minCoverage)
      .select(col("__cid").as(idCol), col("__eid").as("eval_id"),
        col("n_shared"), col("__esize").as("n_eval_shingles"), col("coverage"))
  }
}
