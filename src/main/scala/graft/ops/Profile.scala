package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Column-level data profiling (`ANALYZE`-style): one output row per
  * profiled column with row count, non-null count, distinct count, and
  * min/max rendered as strings — the first thing run against an unknown
  * 100 TB drop before any pipeline is pointed at it.
  *
  * One pass: all per-column aggregates go into a SINGLE `agg` (one scan,
  * one reduce). The 1-row wide result is then melted to rows driver-side —
  * it is 4 values per column, so the melt is free, and building the output
  * from the collected row (not a `stack` SQL string) keeps arbitrary
  * column names safe: nothing is ever spliced into parsed SQL, so names
  * with spaces, quotes, or dots all work.
  *
  * `exact = false` (default) uses `approx_count_distinct` (HLL±5%): the
  * right call at scale, where per-column exact distinct forces an Expand
  * (input replicated once per distinct aggregate) with a shuffle of every
  * distinct value. `exact = true` is for bounded tables and oracle
  * comparison.
  */
object Profile {

  private val outSchema = StructType(new StructType()
    .add("column_name", StringType, nullable = false)
    .add("n_rows", LongType, nullable = false)
    .add("n_nonnull", LongType, nullable = false)
    .add("n_distinct", LongType, nullable = false)
    .add("min_value", StringType, nullable = true)
    .add("max_value", StringType, nullable = true))

  def profile(
      df: DataFrame,
      columns: Seq[String],
      exact: Boolean = false,
      rsd: Double = 0.05): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    columns.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    // backtick-quote the reference: a bare col("a.b") parses the dot as a
    // struct-field access; quoting treats the name atomically
    def ref(c: String): Column = col("`" + c.replace("`", "``") + "`")
    def distinctAgg(c: Column) =
      if (exact) countDistinct(c) else approx_count_distinct(c, rsd)
    val aggs = columns.flatMap { c =>
      Seq(count(ref(c)), distinctAgg(ref(c)),
        min(ref(c)).cast("string"), max(ref(c)).cast("string"))
    }
    val wide = df.agg(count(lit(1)), aggs: _*).head()
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    columns.zipWithIndex.foreach { case (c, i) =>
      rows.add(Row(c, wide.getLong(0), wide.getLong(1 + 4 * i),
        wide.getLong(2 + 4 * i), wide.getString(3 + 4 * i), wide.getString(4 + 4 * i)))
    }
    df.sparkSession.createDataFrame(rows, outSchema)
  }
}
