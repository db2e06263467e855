package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling (`ANALYZE`-style): one output row per
  * profiled column with row count, non-null count, distinct count, and
  * min/max rendered as strings — the first thing run against an unknown
  * 100 TB drop before any pipeline is pointed at it.
  *
  * One pass: all per-column aggregates go into a SINGLE `agg` (one scan,
  * one reduce), then the 1-row wide result is melted to rows driver-side
  * with `stack` — the wide row is tiny (4 values per column), so the melt
  * is free.
  *
  * `exact = false` (default) uses `approx_count_distinct` (HLL±5%): the
  * right call at scale, where per-column exact distinct forces an Expand
  * (input replicated once per distinct aggregate) with a shuffle of every
  * distinct value. `exact = true` is for bounded tables and oracle
  * comparison.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String], exact: Boolean = false): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    columns.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    def distinctAgg(c: Column) =
      if (exact) countDistinct(c) else approx_count_distinct(c)
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        distinctAgg(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = columns
      .map(c => s"'$c', __nn_$c, __nd_$c, __mn_$c, __mx_$c")
      .mkString(", ")
    wide.select(col("__n").as("n_rows"),
        expr(s"stack(${columns.size}, $stacked) AS " +
          "(column_name, n_nonnull, n_distinct, min_value, max_value)"))
      .select("column_name", "n_rows", "n_nonnull", "n_distinct",
        "min_value", "max_value")
  }
}
