package graft

import org.apache.spark.sql.functions._

import graft.ops.Constraints
import graft.ops.Constraints._

class ConstraintsSpec extends SparkSpec {

  private def audit(df: org.apache.spark.sql.DataFrame, checks: Seq[Check]): Map[String, (Long, Boolean)] =
    Constraints.audit(df, checks).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

  test("row-level checks fold into one pass and count violations exactly") {
    import spark.implicits._
    val df = Seq(
      (Some(1), Some(10.0)), (Some(2), Some(200.0)), (None, Some(-5.0)),
      (Some(4), None), (Some(4), Some(50.0))).toDF("id", "v")
    val out = audit(df, Seq(
      NotNull("id"), NotNull("v"), InRange("v", 0.0, 100.0),
      Satisfies(col("v") > 0 || col("id") > 3, "v_pos_or_late_id")))
    assert(out("not_null(id)") == ((1L, false)))
    assert(out("not_null(v)") == ((1L, false)))
    // range: nulls pass (not-null is its own check); -5 and 200 violate
    assert(out("in_range(v,0.0,100.0)") == ((2L, false)))
    // predicate null (v null, id=4>3 true) -> ok; -5 with id null -> violation
    assert(out("satisfies(v_pos_or_late_id)") == ((1L, false)))
  }

  test("uniqueness counts rows beyond the first per duplicate key") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e"), (3, "f"))
      .toDF("k", "x")
    val out = audit(df, Seq(Unique(Seq("k"))))
    assert(out("unique(k)") == ((3L, false))) // 2 extra of k=1, 1 extra of k=3
    assert(audit(df, Seq(Unique(Seq("k", "x"))))("unique(k,x)") == ((0L, true)))
  }

  test("referential integrity counts orphans; null foreign keys are not orphans") {
    import spark.implicits._
    val fact = Seq(Some(1), Some(2), Some(99), None).toDF("fk")
    val dim = Seq(1, 2, 3).toDF("pk")
    val out = audit(fact, Seq(RefIntegrity("fk", dim, "pk")))
    assert(out("ref_integrity(fk)") == ((1L, false)))
  }

  test("a fully clean table passes everything") {
    import spark.implicits._
    val df = Seq((1, 5.0), (2, 6.0)).toDF("id", "v")
    val out = audit(df, Seq(NotNull("id"), InRange("v", 0, 10), Unique(Seq("id"))))
    assert(out.values.forall { case (v, p) => v == 0L && p })
  }

  test("empty check list rejected") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Constraints.audit(Seq((1, 2)).toDF("a", "b"), Seq.empty)
    }
  }
}
