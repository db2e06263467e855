package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the latest right row with
  * the same key and `rightTime <= leftTime`.
  *
  * Implemented as the union + last_value(ignoreNulls) window trick — ONE
  * shuffle on the key, no join explosion: both sides are unioned, sorted
  * within key by time (right rows sort before left rows at equal times so
  * `<=` holds), and each left row picks up the running "most recent right
  * values". A join-then-filter formulation would shuffle both sides AND
  * explode |left| x |right-per-key| intermediates; this stays linear, which
  * is what survives a 100x scale-up.
  *
  * Both directions take an optional `tolerance` (pandas `merge_asof`
  * semantics): the NEAREST match is kept only if it lies within
  * `tolerance` of the left time, else the left row gets nulls — the bound
  * invalidates a too-far match, it never reaches past it to an older one.
  * The matched right time rides inside the fill struct (`__mt`), so the
  * check costs no extra shuffle or join.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry onto left rows. Left and
    *   value column names must not collide; `__mt` is reserved.
    * @param tolerance max allowed `leftTime - matchedRightTime` (e.g.
    *   `expr("INTERVAL 1 HOUR")` for timestamps, a numeric literal for
    *   numeric time axes). None = unbounded (classic as-of). Must be
    *   non-negative: the bound's type is opaque (interval or numeric),
    *   so unlike pandas this is NOT validated — a negative tolerance
    *   contradicts the direction bound and silently yields the no-match
    *   outcome (all nulls) for every row.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    asOf(left, right, leftKey, rightKey, leftTime, rightTime, valueCols,
      tolerance, forwardDir = false)

  /** Forward as-of join: for each left row, attach the EARLIEST right row
    * with the same key and `rightTime >= leftTime`. Same single-shuffle
    * union+window shape as [[backward]], with the window reversed: rows
    * sort descending in time (right rows first at equal times so `>=`
    * holds) and each left row picks up the running "nearest future right
    * values". `tolerance` bounds `matchedRightTime - leftTime`.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    asOf(left, right, leftKey, rightKey, leftTime, rightTime, valueCols,
      tolerance, forwardDir = true)

  private def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      tolerance: Option[Column],
      forwardDir: Boolean): DataFrame = {
    require(!valueCols.contains("__mt"), "valueCols name __mt is reserved")
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__isLeft", lit(1))
    val r = right.select(
      (col(rightKey).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__isLeft") +:
        valueCols.map(col)): _*)
      // a null-time right row has no position in the order — without this
      // filter it sorts NULLS FIRST and becomes the "latest" match for
      // every left row that has no real predecessor
      .filter(col("__t").isNotNull)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows (tag 0) sort before left rows (tag 1) at the same __t, so
    // the inclusive bound holds in both directions
    val w =
      if (forwardDir)
        Window.partitionBy("__k").orderBy(col("__t").desc, col("__isLeft").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else
        Window.partitionBy("__k").orderBy(col("__t").asc, col("__isLeft").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Fill ONE struct of all value columns (plus the matched right time)
    // atomically: per-column last(ignoreNulls) would stitch fields from
    // DIFFERENT right rows whenever a carried column is null on the most
    // recent row.
    val packed = unioned.withColumn("__vals",
      when(col("__isLeft") === 0,
        struct((valueCols.map(col) :+ col("__t").as("__mt")): _*)))
    val filled = packed.withColumn("__vals",
      last(col("__vals"), ignoreNulls = true).over(w))
    // tolerance: the nearest match must sit within the bound, else nulls —
    // null __vals / null __mt make the condition null, which `when`
    // treats as false, exactly the no-match outcome we want
    val within = tolerance match {
      case None => lit(true)
      case Some(tol) =>
        if (forwardDir) col("__vals").getField("__mt") <= col("__t") + tol
        else col("__vals").getField("__mt") >= col("__t") - tol
    }
    val expanded = valueCols.foldLeft(filled) { (df, v) =>
      // a null-time LEFT row has no as-of position either: values stay null
      // (under DESC ordering it would otherwise sort last and see everything)
      df.withColumn(v,
        when(col("__t").isNotNull && within, col("__vals").getField(v)))
    }
    expanded.filter(col("__isLeft") === 1).drop("__k", "__t", "__isLeft", "__vals")
  }
}
