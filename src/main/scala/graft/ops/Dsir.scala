package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{ScaledLn, TextFunctions}

/** DSIR-style data selection by importance resampling (Xie et al., "Data
  * Selection for Language Models via Importance Resampling", NeurIPS 2023):
  * estimate a bag-of-hashed-ngram model on a TARGET corpus (the
  * distribution you want more of, e.g. Wikipedia) and on the RAW corpus
  * (what you are selecting from), weight every candidate document by
  * `log w = Σ_t [ln p_target(t) − ln p_raw(t)]`, then keep the top-k (or
  * a Gumbel-perturbed top-k for true sampling ∝ w). The reference
  * log-file engine has nothing like this; the op extends the repo's
  * LLM-pipeline surface (north star), composing the [[NgramLm]] vocabulary
  * machinery.
  *
  * Integer discipline (the repo-wide [[ScaledLn]] contract): per-token
  * `ln cnt` terms are scaled once to longs, per-doc weights are exact long
  * sums, and the two `ln total` constants enter once each — so weights,
  * ordering, and the selected set reproduce bit-for-bit in any SQL engine.
  * Tokens missing from a vocabulary are priced as count-1 (scaled score 0
  * = ln 1), the same OOV floor as [[NgramLm.unigramScoresWithVocab]];
  * `n_oov_target` / `n_oov_raw` are reported so callers can also gate on
  * OOV rate.
  *
  * Scale shape: the two vocabularies are merged FIRST (one full-outer join
  * of two pre-aggregated (th, cnt) frames on the 8-byte hash) into a single
  * per-token `delta` column, so the candidate-token explode — the only
  * data-scale frame — is joined ONCE, unpinned (AQE broadcasts bounded
  * vocabs, web-scale ones hash-join). Exact top-k selection is a
  * TakeOrdered (fine for bounded k); fraction-scale selection uses ONE
  * `percentile_approx` sketch threshold instead of a global sort — the
  * same exact/approx split as [[NgramLm.pplBuckets]].
  */
object Dsir {

  /** Per-candidate importance weights against caller-supplied target/raw
    * vocabularies (both (th, cnt) frames as built by
    * [[NgramLm.tokenVocabulary]]; counts >= 1). Output: (idCol,
    * carryCols…, n_tokens, n_oov_target, n_oov_raw, scaled_weight) for
    * docs with >= 1 token; `scaled_weight` is the 1e6-scaled integer
    * `Σ ln cnt_p − Σ ln cnt_q − n·(ln total_p − ln total_q)`.
    *
    * Both vocab frames are consumed twice (total + join) and persisted
    * for the duration; call the returned release handle after the
    * terminal action.
    */
  def importanceWeights(
      candidates: DataFrame,
      idCol: String,
      textCol: String,
      targetVocab: DataFrame,
      rawVocab: DataFrame,
      carryCols: Seq[String] = Nil): (DataFrame, () => Unit) = {
    val p = targetVocab.persist(StorageLevel.MEMORY_AND_DISK)
    val q = rawVocab.persist(StorageLevel.MEMORY_AND_DISK)
    val totalP = p.agg(coalesce(sum("cnt"), lit(0L))).head.getLong(0)
    val totalQ = q.agg(coalesce(sum("cnt"), lit(0L))).head.getLong(0)
    val lnTotDelta =
      (if (totalP > 0) ScaledLn.long(totalP) else 0L) -
        (if (totalQ > 0) ScaledLn.long(totalQ) else 0L)
    // Merge the two models into one per-token frame BEFORE touching the
    // candidate explode: delta = s(cnt_p) − s(cnt_q) with the OOV floor
    // (missing side contributes 0), plus presence flags for OOV counting.
    val merged = p
      .select(col("th"), ScaledLn.column(col("cnt")).as("__sp"))
      .join(q.select(col("th"), ScaledLn.column(col("cnt")).as("__sq")),
        Seq("th"), "full_outer")
      .select(col("th"),
        (coalesce(col("__sp"), lit(0L)) - coalesce(col("__sq"), lit(0L)))
          .as("__delta"),
        col("__sp").isNull.as("__oov_p"), col("__sq").isNull.as("__oov_q"))
    val out = candidates
      .select(col(idCol) +: carryCols.map(col) :+
        explode(TextFunctions.tokenHashes(col(textCol))).as("th"): _*)
      .join(merged, Seq("th"), "left")
      .groupBy(idCol, carryCols: _*)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(coalesce(col("__oov_p"), lit(true)), 1L).otherwise(0L))
          .as("n_oov_target"),
        sum(when(coalesce(col("__oov_q"), lit(true)), 1L).otherwise(0L))
          .as("n_oov_raw"),
        sum(coalesce(col("__delta"), lit(0L))).as("__sum_delta"))
      .withColumn("scaled_weight",
        col("__sum_delta") - col("n_tokens") * lit(lnTotDelta))
      .drop("__sum_delta")
    (out, () => { p.unpersist(blocking = false); q.unpersist(blocking = false); () })
  }

  /** Exact deterministic selection: top-`k` rows by (scaled_weight desc,
    * idCol asc — the total-order tiebreak). A TakeOrdered, not a global
    * sort; right for bounded k and the oracle path.
    */
  def selectTopK(weights: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    weights.orderBy(col("scaled_weight").desc, col(idCol)).limit(k)
  }

  /** Scale-path selection of ~`fraction` of the candidates: the weight
    * threshold comes from ONE `percentile_approx` sketch aggregate (no
    * global sort, no driver-side k buffering), then a filter keeps rows
    * at or above it. Populations are approximate near the threshold
    * (sketch error); the ordering invariant (higher weight ⇒ never
    * dropped while a lower weight is kept) holds exactly.
    */
  def selectFraction(weights: DataFrame, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"need 0 < fraction <= 1, got $fraction")
    val thr = weights
      .agg(percentile_approx(col("scaled_weight"), lit(1.0 - fraction), lit(10000)))
      .head.getLong(0)
    weights.filter(col("scaled_weight") >= thr)
  }

  /** Gumbel-top-k resampling key — true "sample ∝ w without replacement"
    * instead of hard top-k: key = scaled_weight + round(1e6 · g) with
    * `g = −ln(−ln u)` and `u ∈ (0,1)` derived from `xxhash64(id, seed)`,
    * so the draw is deterministic per (id, seed), reproducible across
    * runs and partitionings, and re-seedable for fresh epochs. Select
    * with [[selectTopK]]/[[selectFraction]] on `gumbel_key`.
    */
  def withGumbelKey(weights: DataFrame, idCol: String, seed: Long): DataFrame = {
    // Map the 64-bit hash to u in (0,1) keeping both endpoints open:
    // (h >>> 11) yields 53 uniform bits, +0.5 centers away from 0 and 1.
    val u = (shiftrightunsigned(xxhash64(col(idCol), lit(seed)), 11)
      .cast("double") + lit(0.5)) / lit(9007199254740992.0) // 2^53
    weights.withColumn("gumbel_key",
      col("scaled_weight") +
        round(-log(-log(u)) * lit(1e6)).cast("long"))
  }
}
