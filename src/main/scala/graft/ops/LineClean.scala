package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CleanLines

/** C4-style page cleaning (Raffel et al. 2020): the published line +
  * page rules that produced the C4 corpus, the standard first-pass web
  * cleanup before dedup/quality filtering. Line rules (terminal
  * punctuation, minimum word count, banned substrings) run in the
  * one-pass codegen [[CleanLines]] expression; page rules are plain
  * column predicates on top:
  *
  *   - a page is dropped when fewer than `minLines` lines survive
  *     (C4 keeps pages with >= 3 sentences; retained lines each end in
  *     terminal punctuation, so the retained-line count is the
  *     documented lower-bound proxy),
  *   - or when the RAW page contains any `bannedPage` substring
  *     case-insensitively (C4: "lorem ipsum", "{" — code pages).
  *
  * Scale shape: zero shuffles and zero joins — one narrow projection per
  * page; every predicate is codegen inside the scan stage, so the op
  * runs at read throughput and composes with pushdown. Output keeps
  * every input page with its verdict (`page_kept`) plus `clean_text`
  * (the retained lines re-joined, null for dropped pages) so callers
  * can either `filter(page_kept)` or audit removal rates per source.
  */
object LineClean {

  def cleanPages(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 5,
      minLines: Int = 3,
      bannedLine: Seq[String] = Seq("javascript"),
      bannedPage: Seq[String] = Seq("lorem ipsum", "{"),
      carryCols: Seq[String] = Nil): DataFrame = {
    require(minLines >= 1, s"minLines must be >= 1, got $minLines")
    val pageBad = bannedPage
      .map(s => lower(col("__text")).contains(s.toLowerCase))
      .reduceOption(_ || _).getOrElse(lit(false))
    df.select(col(idCol) +: carryCols.map(col) :+ col(textCol).as("__text"): _*)
      // #lines = #newlines + 1, without materializing a second array
      .withColumn("n_lines",
        length(col("__text")) - length(regexp_replace(col("__text"), "\n", "")) + 1)
      .withColumn("__kept", CleanLines(col("__text"), minWords, bannedLine))
      .withColumn("n_kept_lines", size(col("__kept")))
      .withColumn("page_kept",
        col("n_kept_lines") >= minLines && !pageBad)
      .withColumn("clean_text",
        when(col("page_kept"), array_join(col("__kept"), "\n")))
      .drop("__text", "__kept")
  }
}
