package graft

import org.apache.spark.sql.functions._

import graft.ops.Anonymize

class AnonymizeSpec extends SparkSpec {

  private def df() = {
    import spark.implicits._
    // (id, lang, source): (en, web) ×3, (en, book) ×2, (de, web) ×1
    Seq(
      (1L, "en", "web"), (2L, "en", "web"), (3L, "en", "web"),
      (4L, "en", "book"), (5L, "en", "book"),
      (6L, "de", "web")
    ).toDF("id", "lang", "source")
  }

  test("groups below k are suppressed (quasi cols nulled), others intact; payload untouched") {
    val out = Anonymize.kAnonymize(df(), Seq("lang", "source"), 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
      .toSet
    assert(out == Set(
      (1L, "en", "web", false), (2L, "en", "web", false), (3L, "en", "web", false),
      (4L, "en", "book", false), (5L, "en", "book", false),
      (6L, null, null, true)))
  }

  test("k=1 suppresses nothing; k above the largest group suppresses everything") {
    val none = Anonymize.kAnonymize(df(), Seq("lang", "source"), 1)
    assert(none.filter(col("__suppressed")).count() == 0)
    val all = Anonymize.kAnonymize(df(), Seq("lang", "source"), 99)
    assert(all.filter(!col("__suppressed")).count() == 0)
    assert(all.filter(col("lang").isNotNull || col("source").isNotNull).count() == 0)
  }

  test("NULL quasi values form their own group and are counted, not leaked") {
    import spark.implicits._
    val d = Seq(
      (1L, Option("en")), (2L, Option.empty[String]), (3L, Option.empty[String])
    ).toDF("id", "lang")
    val out = Anonymize.kAnonymize(d, Seq("lang"), 2)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getBoolean(2))).toSet
    // the two NULL-lang rows are a group of 2 → survive; the lone "en" suppresses
    assert(out == Set(
      (1L, None, true), (2L, None, false), (3L, None, false)))
  }

  test("audit reports every distinct quasi tuple with its verdict") {
    val a = Anonymize.audit(df(), Seq("lang", "source"), 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(a == Set(
      ("en", "web", 3L, false), ("en", "book", 2L, false), ("de", "web", 1L, true)))
  }

  test("suppression marks exactly the audit's suppressed groups (row counts agree)") {
    val d = df()
    val suppressedRows = Anonymize.kAnonymize(d, Seq("lang", "source"), 3)
      .filter(col("__suppressed")).count()
    val auditRows = Anonymize.audit(d, Seq("lang", "source"), 3)
      .filter(col("suppressed")).agg(sum("group_n")).collect()(0).getLong(0)
    assert(suppressedRows == auditRows)
  }

  test("bad arguments are config errors") {
    intercept[IllegalArgumentException](Anonymize.kAnonymize(df(), Nil, 2))
    intercept[IllegalArgumentException](Anonymize.kAnonymize(df(), Seq("lang"), 0))
  }
}
