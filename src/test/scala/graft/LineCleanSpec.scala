package graft

import org.apache.spark.sql.functions._

import graft.functions.CleanLines
import graft.ops.LineClean

/** Specs for C4-style cleaning: per-rule line matrix on the codegen
  * expression, page-level verdicts, and codegen/interpreted agreement.
  */
class LineCleanSpec extends SparkSpec {

  import spark.implicits._

  private def clean(text: String, minWords: Int = 5,
      banned: Seq[String] = Seq("javascript")): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(CleanLines(col("t"), minWords, banned).as("k"))
      .as[Seq[String]].head()

  test("line rules: terminal punctuation, word count, banned, trim") {
    val page = Seq(
      "one two three four five.", // kept
      "one two three four five", // no terminal punctuation
      "one two three four.", // 4 words < 5
      "  padded two three four five!  ", // kept, trimmed
      "ends with quote two three four\"", // kept ("\"" is terminal)
      "say five words about JavaScript today.", // banned, case-insensitive
      "", // empty
      "tab\tseparated words count as four?", // 5 words (tab splits), kept
      "one two three four five six?") // kept
    val got = clean(page.mkString("\n"))
    assert(got == Seq(
      "one two three four five.",
      "padded two three four five!",
      "ends with quote two three four\"",
      "tab\tseparated words count as four?",
      "one two three four five six?"))
  }

  test("page rules: min retained lines, lorem ipsum, brace") {
    val good = "a b c d e.\nf g h i j!\nk l m n o?"
    val short = "a b c d e.\nf g h i j!"
    val lorem = good + "\nsee Lorem Ipsum text"
    val brace = good + "\nvar x = { 1 }"
    val df = Seq((1L, good), (2L, short), (3L, lorem), (4L, brace))
      .toDF("id", "text")
    val got = LineClean.cleanPages(df, "id", "text")
      .select("id", "n_lines", "n_kept_lines", "page_kept", "clean_text")
      .as[(Long, Long, Long, Boolean, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 3L, true, Some(good)),
      (2L, 2L, 2L, false, None),
      (3L, 4L, 3L, false, None), // banned-page lines are also not terminal
      (4L, 4L, 3L, false, None)))
  }

  test("codegen and interpreted evaluation agree on the fixture corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .limit(200)
      .select(concat_ws("\n", col("text"), lit("tail line a b c d."),
        col("text")).as("t"))
    val expr = CleanLines(col("t"), 3, Seq("javascript"))
    val a = docs.select(expr.as("k")).as[Seq[String]].collect().toSeq
    val interpreted = docs.select(col("t")).as[String].collect().toSeq
      .map(s => CleanLines.compute(s, 3, Array("javascript")).toSeq.map(_.toString))
    assert(a == interpreted)
  }
}
