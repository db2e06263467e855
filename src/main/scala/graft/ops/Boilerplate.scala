package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level boilerplate detection: word n-grams whose DOCUMENT
  * frequency exceeds a fraction of the corpus are "common" (headers,
  * footers, license blurbs, navigation text), and a document's boilerplate
  * share is the fraction of its distinct n-grams that are common — the
  * cross-document complement of the intra-document repetition signal
  * (CCNet/Gopher-style corpus scrubbing).
  *
  * Plan shape, scale-first:
  *   - n-grams are built per row from codegen'd builtins (`sequence` →
  *     `slice` → `array_join`) and deduped per doc BEFORE the explode
  *     (`array_distinct`), so the shuffle carries distinct (doc, gram)
  *     pairs, not every occurrence;
  *   - document frequency is one hash aggregate on the gram (partial
  *     aggregation absorbs the hot grams map-side — the common grams are by
  *     definition the skewed keys);
  *   - the common-gram set (df >= threshold) is small by construction, so
  *     the per-doc share join broadcasts it (`broadcast()` pinned) — no
  *     second full shuffle of the corpus.
  */
object Boilerplate {

  /** Distinct word `n`-grams of `textCol` as an array column (codegen'd,
    * no shuffle). A doc with fewer than `n` tokens has zero n-grams.
    */
  def ngrams(textCol: Column, n: Int): Column = {
    require(n > 0, s"n must be positive, got $n")
    val toks = TextFunctions.tokens(textCol)
    val count = size(toks) - (n - 1)
    array_distinct(
      when(count > 0,
        transform(sequence(lit(0), count - 1), i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array()))
  }

  /** (ngram, df) rows for n-grams appearing in at least `minDocFraction`
    * of documents.
    */
  def commonNgrams(
      df: DataFrame,
      textCol: String,
      n: Int,
      minDocFraction: Double): DataFrame = {
    require(minDocFraction > 0 && minDocFraction <= 1,
      s"minDocFraction must be in (0,1], got $minDocFraction")
    val total = df.count() // one count job; the threshold is corpus-relative
    val minDocs = math.max(1L, math.ceil(minDocFraction * total).toLong)
    df.select(explode(ngrams(col(textCol), n)).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
  }

  /** Appends `n_grams`, `n_common`, `boilerplate_share` per document (share
    * is 0.0 for docs with no n-grams). `common` must be the (small)
    * `commonNgrams` output — it is broadcast.
    */
  def withBoilerplateShare(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      common: DataFrame): DataFrame = {
    val grams = df.select(col(idCol), explode(ngrams(col(textCol), n)).as("ngram"))
    val perDoc = grams
      .join(broadcast(common.select(col("ngram"), lit(1L).as("__is_common"))),
        Seq("ngram"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("__is_common"), lit(0L))).as("n_common"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("n_grams", coalesce(col("n_grams"), lit(0L)))
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn(
        "boilerplate_share",
        when(col("n_grams") > 0, col("n_common").cast("double") / col("n_grams"))
          .otherwise(lit(0.0)))
  }
}
