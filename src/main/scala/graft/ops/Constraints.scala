package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing — the publish gate of a production
  * pipeline: declare the table's contract (non-null keys, value ranges,
  * key uniqueness, referential integrity), evaluate everything with as
  * few passes as the checks allow, and emit one row per constraint with
  * the violation count.
  *
  * Cost model at 100 TB:
  *  - ALL row-level checks (not-null, range, custom predicate) fold into
  *    ONE aggregate over one scan — adding a check is a new conditional
  *    sum, never a new pass;
  *  - uniqueness is one hash aggregate on the key (count of over-counted
  *    keys);
  *  - referential integrity is one left-anti join per declared reference
  *    (dimension side broadcast when small — Catalyst's choice).
  * Nothing collects beyond the one row per constraint.
  */
object Constraints {

  sealed trait Check { def name: String }
  /** Violation when the column is null. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null($col)"
  }
  /** Violation when non-null value falls outside [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range($col,$lo,$hi)"
  }
  /** Violation when the boolean predicate is false or null for a row. */
  final case class Satisfies(predicate: Column, label: String) extends Check {
    def name = s"satisfies($label)"
  }
  /** Violations = rows beyond the first per duplicate key tuple. */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** Violations = rows whose non-null value has no match in dim.dimCol. */
  final case class RefIntegrity(col: String, dim: DataFrame, dimCol: String) extends Check {
    def name = s"ref_integrity($col)"
  }

  /** One row per check: (constraint, n_violations, passed), ordered by
    * constraint name.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    val spark = df.sparkSession
    import spark.implicits._

    // every row-level check folds into the ONE aggregate pass
    val rowLevel: Seq[(String, Column)] = checks.collect {
      case c @ NotNull(col0) =>
        c.name -> sum(when(col(col0).isNull, 1L).otherwise(0L))
      case c @ InRange(col0, lo, hi) =>
        c.name -> sum(when(col(col0).isNotNull &&
          (col(col0) < lo || col(col0) > hi), 1L).otherwise(0L))
      case c @ Satisfies(p, _) =>
        c.name -> sum(when(coalesce(p, lit(false)), 0L).otherwise(1L))
    }
    val rowLevelRows: Seq[(String, Long)] =
      if (rowLevel.isEmpty) Seq.empty
      else {
        val r = df.agg(rowLevel.head._2.as("c0"),
          rowLevel.tail.zipWithIndex.map { case ((_, c), i) => c.as(s"c${i + 1}") }: _*)
          .head()
        rowLevel.zipWithIndex.map { case ((n, _), i) => n -> r.getLong(i) }
      }

    val otherRows: Seq[(String, Long)] = checks.collect {
      case c @ Unique(cols0) =>
        val dup = df.groupBy(cols0.map(col): _*).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1)
          .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("v"))
          .head().getLong(0)
        c.name -> dup
      case c @ RefIntegrity(col0, dim, dimCol) =>
        val orphans = df.filter(col(col0).isNotNull)
          .join(dim.select(col(dimCol).as(col0)).distinct(), Seq(col0), "left_anti")
          .count()
        c.name -> orphans
    }

    (rowLevelRows ++ otherRows).sortBy(_._1)
      .map { case (n, v) => (n, v, v == 0L) }
      .toDF("constraint", "n_violations", "passed")
  }
}
