package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension TYPE-2 merge — the warehouse pattern that
  * turns a stream of dimension snapshots into a queryable row history:
  * every key keeps one OPEN row (`valid_to` null, `is_current` true) plus
  * closed versions with their validity interval.
  *
  * One merge step against a new snapshot taken at `asOf`:
  *  - attribute change  → close the open row at `asOf`, insert the new
  *    version open from `asOf`,
  *  - key missing from the snapshot (deleted upstream) → close the row,
  *  - new key → insert an open row,
  *  - unchanged → pass through.
  *
  * Scale shape: already-closed history NEVER enters the join — the live
  * slice (one row per key, the bounded side of any dimension) full-outer
  * equi-joins the snapshot on the key, and closed rows union back
  * untouched. Attribute comparison is null-safe (`<=>`). Everything is
  * deterministic: no timestamps are generated, `asOf` is caller-supplied.
  */
object Scd2 {

  /** `history` columns: key, attrs..., `valid_from`, `valid_to`,
    * `is_current`; an initial load is `snapshotAsHistory`. `snapshot`
    * columns: key, attrs... Returns the merged history.
    */
  def merge(
      history: DataFrame,
      snapshot: DataFrame,
      key: String,
      attrs: Seq[String],
      asOf: Column): DataFrame = {
    require(attrs.nonEmpty, "attrs must be non-empty")
    val closed = history.filter(!col("is_current"))
    val cur = history.filter(col("is_current"))

    val snapAliased = snapshot.select(
      (col(key).as(s"__snap_$key") +: attrs.map(a => col(a).as(s"__snap_$a"))): _*)
    val j = cur.join(snapAliased, col(key) === col(s"__snap_$key"), "full_outer")

    val inCur = col(key).isNotNull
    val inSnap = col(s"__snap_$key").isNotNull
    val same = attrs.map(a => col(a) <=> col(s"__snap_$a")).reduce(_ && _)

    val unchanged = j.filter(inCur && inSnap && same)
      .select(history.columns.map(col): _*)
    val closedNow = j.filter(inCur && (!inSnap || !same))
      .select(col(key) +: attrs.map(col) :+ col("valid_from") :+
        asOf.as("valid_to") :+ lit(false).as("is_current"): _*)
    val opened = j.filter(inSnap && (!inCur || !same))
      .select(col(s"__snap_$key").as(key) +:
        attrs.map(a => col(s"__snap_$a").as(a)) :+
        asOf.as("valid_from") :+ lit(null).cast("date").as("valid_to") :+
        lit(true).as("is_current"): _*)

    closed.unionByName(unchanged).unionByName(closedNow).unionByName(opened)
  }

  /** An initial history load: every snapshot row open from `asOf`. */
  def snapshotAsHistory(snapshot: DataFrame, key: String, attrs: Seq[String], asOf: Column): DataFrame =
    snapshot.select(col(key) +: attrs.map(col) :+ asOf.as("valid_from") :+
      lit(null).cast("date").as("valid_to") :+ lit(true).as("is_current"): _*)
}
