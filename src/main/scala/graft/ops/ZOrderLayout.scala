package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.functions.ZOrder64

/** Z-order (Morton) clustering for data skipping — the write-side layout
  * that makes a 100 TB table selectively scannable on TWO dimensions at
  * once: rows are range-partitioned and sorted by the interleaved
  * [[ZOrder64]] key, so each output file covers a compact rectangle in
  * (c1, c2) space and parquet min/max stats prune row groups for
  * predicates on either column.
  *
  * One range exchange (the same shuffle any global sort pays) + an
  * in-partition sort; the z column is dropped before the write, so the
  * schema is unchanged — layout only, never a row. `ZOrderSpec` pins the
  * per-file span bound against a grid corpus; `q_zorder_scan`'s oracle
  * certifies row-level losslessness.
  */
object ZOrderLayout {

  /** The clustered frame, not yet written: both columns must be
    * non-negative longs (< 2^31 for strict z ordering — see [[ZOrder64]]).
    */
  def clusteredFrame(df: DataFrame, c1: String, c2: String, nFiles: Int): DataFrame = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val z = "__graft_z"
    require(!df.columns.contains(z), s"reserved column name $z already present")
    df.withColumn(z, ZOrder64(col(c1).cast("long"), col(c2).cast("long")))
      .repartitionByRange(nFiles, col(z))
      .sortWithinPartitions(z)
      .drop(z)
  }

  /** Write `df` to `outDir` z-clustered by (c1, c2) into ~nFiles files. */
  def write(df: DataFrame, c1: String, c2: String, nFiles: Int, outDir: String): Unit =
    clusteredFrame(df, c1, c2, nFiles).write.mode("overwrite").parquet(outDir)
}
