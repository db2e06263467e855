package graft

import org.apache.spark.sql.functions._

import graft.ops.Scd2

class Scd2Spec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Int, String, String, String, Boolean)] =
    df.collect().map { r =>
      (r.getInt(0), r.getString(1),
        Option(r.getDate(2)).map(_.toString).orNull,
        Option(r.getDate(3)).map(_.toString).orNull,
        r.getBoolean(4))
    }.toSet

  test("change closes the old version and opens a new one; unchanged passes through") {
    import spark.implicits._
    val h0 = Scd2.snapshotAsHistory(
      Seq((1, "alice"), (2, "bob")).toDF("id", "name"),
      "id", Seq("name"), to_date(lit("2024-01-01")))
    val h1 = Scd2.merge(h0,
      Seq((1, "alice"), (2, "bobby")).toDF("id", "name"),
      "id", Seq("name"), to_date(lit("2024-02-01")))
    assert(rows(h1) == Set(
      (1, "alice", "2024-01-01", null, true),
      (2, "bob", "2024-01-01", "2024-02-01", false),
      (2, "bobby", "2024-02-01", null, true)))
  }

  test("delete closes; new key opens; closed history is never touched again") {
    import spark.implicits._
    val h0 = Scd2.snapshotAsHistory(
      Seq((1, "a"), (2, "b")).toDF("id", "name"), "id", Seq("name"),
      to_date(lit("2024-01-01")))
    val h1 = Scd2.merge(h0, Seq((2, "b2")).toDF("id", "name"),
      "id", Seq("name"), to_date(lit("2024-02-01"))) // 1 deleted, 2 changed
    val h2 = Scd2.merge(h1, Seq((2, "b2"), (3, "c")).toDF("id", "name"),
      "id", Seq("name"), to_date(lit("2024-03-01"))) // 3 appears, 2 unchanged
    assert(rows(h2) == Set(
      (1, "a", "2024-01-01", "2024-02-01", false),
      (2, "b", "2024-01-01", "2024-02-01", false),
      (2, "b2", "2024-02-01", null, true),
      (3, "c", "2024-03-01", null, true)))
  }

  test("null attribute values compare null-safely (no spurious versions)") {
    import spark.implicits._
    val h0 = Scd2.snapshotAsHistory(
      Seq((1, null: String)).toDF("id", "name"), "id", Seq("name"),
      to_date(lit("2024-01-01")))
    val h1 = Scd2.merge(h0, Seq((1, null: String)).toDF("id", "name"),
      "id", Seq("name"), to_date(lit("2024-02-01")))
    assert(rows(h1) == Set((1, null, "2024-01-01", null, true)))
    val h2 = Scd2.merge(h1, Seq((1, "x")).toDF("id", "name"),
      "id", Seq("name"), to_date(lit("2024-03-01")))
    assert(rows(h2) == Set(
      (1, null, "2024-01-01", "2024-03-01", false),
      (1, "x", "2024-03-01", null, true)))
  }

  test("re-appearing key after deletion gets a fresh open row") {
    import spark.implicits._
    val h0 = Scd2.snapshotAsHistory(Seq((1, "a")).toDF("id", "name"),
      "id", Seq("name"), to_date(lit("2024-01-01")))
    val h1 = Scd2.merge(h0, Seq.empty[(Int, String)].toDF("id", "name"),
      "id", Seq("name"), to_date(lit("2024-02-01")))
    val h2 = Scd2.merge(h1, Seq((1, "a")).toDF("id", "name"),
      "id", Seq("name"), to_date(lit("2024-03-01")))
    assert(rows(h2) == Set(
      (1, "a", "2024-01-01", "2024-02-01", false),
      (1, "a", "2024-03-01", null, true)))
  }

  test("merge is idempotent: re-merging the same snapshot changes nothing") {
    import spark.implicits._
    val h0 = Scd2.snapshotAsHistory(
      Seq((1, "a"), (2, "b")).toDF("id", "name"), "id", Seq("name"),
      to_date(lit("2024-01-01")))
    val snap = Seq((1, "a2"), (3, "c")).toDF("id", "name")
    val h1 = Scd2.merge(h0, snap, "id", Seq("name"), to_date(lit("2024-02-01")))
    val h2 = Scd2.merge(h1, snap, "id", Seq("name"), to_date(lit("2024-03-01")))
    assert(rows(h2) == rows(h1))
  }

  test("empty attrs rejected") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Scd2.merge(Seq((1, "a")).toDF("id", "name"),
        Seq((1, "a")).toDF("id", "name"), "id", Seq.empty, current_date())
    }
  }
}
