package graft.ops

import org.apache.spark.sql.DataFrame
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
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry onto left rows. Left and
    *   value column names must not collide.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String]): DataFrame = {
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
    // right rows (tag 0) sort before left rows (tag 1) at the same __t → "<="
    val w = Window.partitionBy("__k").orderBy(col("__t").asc, col("__isLeft").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Fill ONE struct of all value columns atomically: per-column
    // last(ignoreNulls) would stitch fields from DIFFERENT right rows
    // whenever a carried column is null on the most recent row.
    val packed = unioned.withColumn("__vals",
      when(col("__isLeft") === 0, struct(valueCols.map(col): _*)))
    val filled = packed.withColumn("__vals", last(col("__vals"), ignoreNulls = true).over(w))
    val expanded = valueCols.foldLeft(filled) { (df, v) =>
      // a null-time LEFT row has no as-of position either: values stay null
      // (under DESC ordering it would otherwise sort last and see everything)
      df.withColumn(v, when(col("__t").isNotNull, col("__vals").getField(v)))
    }
    expanded.filter(col("__isLeft") === 1).drop("__k", "__t", "__isLeft", "__vals")
  }

  /** Forward as-of join: for each left row, attach the EARLIEST right row
    * with the same key and `rightTime >= leftTime`. Same single-shuffle
    * union+window shape as [[backward]], with the window reversed: rows
    * sort descending in time (right rows first at equal times so `>=`
    * holds) and each left row picks up the running "nearest future right
    * values".
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__isLeft", lit(1))
    val r = right.select(
      (col(rightKey).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__isLeft") +:
        valueCols.map(col)): _*)
      .filter(col("__t").isNotNull) // see backward(): null-time rows match nothing
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // DESC time; right rows (tag 0) first at the same __t → ">=" holds
    val w = Window.partitionBy("__k").orderBy(col("__t").desc, col("__isLeft").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = unioned.withColumn("__vals",
      when(col("__isLeft") === 0, struct(valueCols.map(col): _*)))
    val filled = packed.withColumn("__vals", last(col("__vals"), ignoreNulls = true).over(w))
    val expanded = valueCols.foldLeft(filled) { (df, v) =>
      df.withColumn(v, when(col("__t").isNotNull, col("__vals").getField(v)))
    }
    expanded.filter(col("__isLeft") === 1).drop("__k", "__t", "__isLeft", "__vals")
  }
}
