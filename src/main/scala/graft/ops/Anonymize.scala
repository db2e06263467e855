package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity enforcement over quasi-identifier columns — the release
  * gate a training-data pipeline needs before shipping a corpus whose
  * metadata (language, source, length bucket, domain, …) could
  * re-identify authors: every surviving combination of quasi-identifier
  * values must be shared by at least `k` rows, and combinations rarer
  * than that are suppressed (quasi-identifiers nulled) rather than
  * leaked.
  *
  * Scale shape: ONE hash aggregate over the quasi-identifier tuple for
  * the group sizes (map-side combinable), then ONE equi-join of those
  * counts back onto the input on the same tuple — both shuffles hash on
  * the quasi-key, so the plan is two exchanges total and no row ever
  * carries more state than its own quasi tuple plus one long. The
  * count side is |distinct quasi tuples| ≤ |input| and usually tiny
  * (it broadcasts when small enough for AQE to notice). No window over
  * a global order, no driver-side group list.
  *
  * The audit is data, not a log line (the repo's no-silent-caps rule):
  * [[audit]] returns the per-group sizes with their suppression
  * verdict, so recall/utility loss is queryable at 100 TB instead of
  * buried in executor stderr.
  */
object Anonymize {

  /** `df` with every quasi-identifier column nulled on rows whose quasi
    * tuple is shared by fewer than `k` rows; adds `__suppressed`
    * (boolean). Non-quasi columns pass through untouched — k-anonymity
    * constrains the identifying dimensions, not the payload.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymize needs at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__qcount"))
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) :+ col("__qcount"): _*)
    // null-safe join keys: a NULL quasi value is itself a group (SQL =
    // would silently drop those rows from the join and leak them
    // unsuppressed)
    val joined = df.join(counts,
      quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _), "left")
      .drop(quasiCols.map(c => s"__q_$c"): _*)
    val suppressed = col("__qcount") < k
    val out = quasiCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, when(suppressed, lit(null)).otherwise(col(c)))
    }
    out.withColumn("__suppressed", suppressed).drop("__qcount")
  }

  /** Per-quasi-group audit: (quasiCols*, group_n, suppressed) — one row
    * per distinct quasi tuple, `suppressed` true when `group_n < k`.
    * Output size is the distinct-tuple count, safe to sink or inspect.
    */
  def audit(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "audit needs at least one quasi-identifier column")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("suppressed", col("group_n") < k)
  }
}
