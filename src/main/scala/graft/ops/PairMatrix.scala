package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Lineage.CutSyntax

/** Bounded all-pairs matrix over a key column's distinct values — the
  * shared shape under pairwise-comparison readouts (Mann–Whitney U,
  * pairwise KL, inter-source Jaccard): expand k distinct keys into the
  * k·(k−1)/2 ordered pairs, then join per-key histograms onto each side.
  *
  * Scale posture: the expansion is quadratic in DISTINCT KEYS, never in
  * rows — safe for a curated probe set, catastrophic if pointed at an
  * unbounded key column (10⁶ sources → 5·10¹¹ pairs). The guard makes
  * that misuse a plan-time error with an actionable message instead of a
  * cluster-melting job: the distinct key set is materialized ONCE via
  * [[Lineage.cut]] (k rows by contract — tiny), so the guard count and
  * BOTH sides of the pair join read the materialized keys instead of
  * re-running `df`'s upstream lineage (which may be a full-corpus
  * aggregate) three times. The pair count is computed in `BigInt`, so a
  * pathological k (> 3·10⁹, where `k·(k−1)` overflows Long and would
  * silently disarm a Long-arithmetic guard) still trips the check. The
  * pair frame broadcasts its right side — k rows by construction — so
  * downstream joins never shuffle on it.
  */
object PairMatrix {

  /** Ordered pairs `(outLeft < outRight)` of `keyCol`'s distinct values.
    * Throws `IllegalArgumentException` when the pair count would exceed
    * `maxPairs`. Key ordering uses the column's natural `<`, so any
    * orderable key type works.
    *
    * Cost contract: exactly ONE job over `df`'s lineage (the distinct),
    * run at call time; the returned frame's execution reads only the
    * checkpointed k-row key set.
    */
  def orderedPairs(
      df: DataFrame,
      keyCol: String,
      outLeft: String = "s1",
      outRight: String = "s2",
      maxPairs: Long = 100000L): DataFrame = {
    require(maxPairs >= 1, s"maxPairs must be >= 1, got $maxPairs")
    // Eager lineage cut: pays df's lineage once and pins the k-row key
    // set (executor blocks, or checkpoint files in reliable mode); the
    // count below is then a k-row scan, not a second corpus aggregate.
    val keys = df.select(col(keyCol)).distinct().cutLineage()
    val k = keys.count()
    val pairs = (BigInt(k) * BigInt(k - 1)) / 2
    require(pairs <= BigInt(maxPairs),
      s"[pairMatrix] $k distinct '$keyCol' keys expand to $pairs ordered pairs, " +
        s"over maxPairs=$maxPairs — filter the key set to a probe subset or " +
        "raise the cap explicitly")
    keys.select(col(keyCol).as(outLeft))
      .crossJoin(broadcast(keys.select(col(keyCol).as(outRight))))
      .filter(col(outLeft) < col(outRight))
  }
}
