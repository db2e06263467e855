package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture log compaction: apply an out-of-order CDC log
  * (upserts + delete tombstones) to a base snapshot and produce the
  * resulting snapshot — the ingest-side sibling of [[Scd2]] (which keeps
  * history; this keeps only the final state) and [[PartitionedSink]]'s
  * upsert (which has no tombstones).
  *
  * Shape: ONE hash aggregate over the log (`max_by` of the payload struct
  * by the caller's total order — map-side combinable, no window, no sort)
  * plus ONE full-outer equi-join with the base. Both scale: the aggregate
  * is per-key state, the join shuffles once on the key. Nothing reaches
  * the driver.
  *
  * The order columns must form a TOTAL order per key (include a unique
  * sequence/id column): ties would make the winning row
  * engine-dependent. Delete wins-then-reinsert works naturally — only the
  * single latest row per key decides.
  */
object CdcApply {

  /** @param base        current snapshot: keyCols + payloadCols
    * @param log         CDC stream: keyCols + ordCols + opCol + payloadCols
    * @param ordCols     total-order columns, latest wins (e.g. ts, seq)
    * @param deleteOp    `opCol` value marking a tombstone; any other value
    *                    is an upsert of the row's payload
    * @return the compacted snapshot: keyCols + payloadCols — base rows
    *         survive untouched keys, upserts replace/insert, tombstoned
    *         keys are gone
    */
  def compact(
      base: DataFrame,
      log: DataFrame,
      keyCols: Seq[String],
      ordCols: Seq[String],
      opCol: String,
      deleteOp: String,
      payloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && ordCols.nonEmpty && payloadCols.nonEmpty,
      "keyCols, ordCols, payloadCols must be non-empty")
    val reserved = "__last"
    require(!(base.columns ++ log.columns).contains(reserved),
      s"column name $reserved is reserved")

    val latest = log
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(
        struct((opCol +: payloadCols).map(col): _*),
        struct(ordCols.map(col): _*)).as(reserved))

    val joined = base.join(latest, keyCols, "full_outer")
    val noLog: Column = col(reserved).isNull
    joined
      .filter(noLog || col(s"$reserved.$opCol") =!= deleteOp)
      .select(keyCols.map(col) ++ payloadCols.map(c =>
        when(noLog, col(c)).otherwise(col(s"$reserved.$c")).as(c)): _*)
  }
}
