package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the incremental-ingest bookkeeping step:
  * given two snapshots keyed by document id, classify every id as
  * `added` (new only), `removed` (old only), `changed` (both, different
  * content fingerprint), or `unchanged`. Drives "process only what
  * moved" pipelines: the added+changed slice feeds re-embedding /
  * re-scoring, the removed slice feeds index eviction.
  *
  * Scale shape: ONE full-outer equi-join on the id — both sides shuffle
  * by the same key (or co-locate for free when both snapshots are
  * id-bucketed on storage), state is two fingerprint columns, never the
  * document bodies. Content equality is by caller-supplied fingerprint
  * (e.g. `TextFunctions.contentFingerprint` — 64 bits of md5 over
  * normalized text), so a fingerprint collision mislabels a changed doc
  * `unchanged` with probability ~2⁻⁶⁴ per pair — the standard
  * content-addressable-storage bet.
  */
object SnapshotDiff {

  /** Diff `oldDf` → `newDf`; both need (`idCol`, `fpCol`). Output:
    * (`idCol`, status) with status ∈ added | removed | changed |
    * unchanged. Ids must be unique per snapshot (it's a key).
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      fpCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("__oid"), col(fpCol).as("__ofp"))
    val n = newDf.select(col(idCol).as("__nid"), col(fpCol).as("__nfp"))
    o.join(n, col("__oid") === col("__nid"), "full_outer")
      .select(
        coalesce(col("__oid"), col("__nid")).as(idCol),
        when(col("__oid").isNull, "added")
          .when(col("__nid").isNull, "removed")
          .when(col("__ofp") === col("__nfp"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
